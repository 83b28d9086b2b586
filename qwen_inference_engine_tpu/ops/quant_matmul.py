"""Pallas fused weight-dequant (INT8/INT4) matmul — the north-star kernel.

Computes ``y[M,N] = x[M,K] @ dequant(Wq)[K,N]`` reading only the packed int
bytes (+ scales) from HBM.  At decode (M small) every weight byte is read
exactly once per step, so this kernel sets the decode throughput roofline
(BASELINE.md: >=85% of INT4 roofline).

Design (measured on v5e via scripts/probe_mixed_dot.py / probe_kf3.py):

* **mixed-input MXU dots** — the MXU consumes int8 operands directly
  (``dot_general(bf16, int8) -> f32``), so the packed weights NEVER touch
  the VPU as per-value converts.  Every earlier design that dequantized
  weight blocks elementwise (int->bf16 cast + scale multiply) was pinned at
  ~530 Gvalues/s of VPU convert throughput; mixed dots run at the MXU pass
  floor (~92 us for a 3584x18944 block at M<=128, = XLA's own int8 speed).
* **plane packing, one scale group per nibble plane** — packed byte
  ``= 16*hi + (lo+8)`` where for k-tile t the low nibbles hold logical
  scale group ``2t`` and the high nibbles group ``2t+1`` (group_size =
  block_k/2).  Unpack is 3 cheap int32 ops on the packed *bytes* (and, &,
  shift), then TWO mixed dots per tile; group scales multiply the [M, bn]
  partial products AFTER the dot (f32-exact), with the lo plane's excess-8
  offset corrected by ``8 * rowsum(x_even)`` — O(M) work, not O(K*N).
* **wide N blocks** — per-grid-cell fixed overhead (~0.4 us) dominates at
  fine group sizes; bn up to ~4736 amortizes it (gs=256 gate matmul:
  141 us at bn=512 -> 94.9 us at bn=4736, the MXU floor).

Grid: (M/bm, N/bn, K/bk), K innermost, f32 VMEM accumulator.

Reference lineage: replaces the WMMA bf16 GEMM of the reference
(layers/src/matrix_mul.cu:165-288) with the quantized path the reference
never had (its repo is pure bf16; INT4/INT8 is the BASELINE.json mandate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen_inference_engine_tpu.ops import linear as _linear


# ----------------------------------------------------------------------
# INT4: plane-packed, two mixed dots per k-tile, post-dot group scales
# ----------------------------------------------------------------------

def _qmm4_kernel(layer_ref, xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref,
                 *, k_tiles, ppt, gs):
    del layer_ref  # consumed by the BlockSpec index maps
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # byte = 16*hi + (lo+8): '&' gives lo+8 in [0,15]; subtract-then-shift
    # gives hi sign-correct (arithmetic shift of a multiple of 16).
    # ppt plane-pairs per k-tile (static loop) keeps the k-tile count — and
    # the serial accumulation chain — short for huge-K projections.
    acc = acc_ref[:]
    for p in range(ppt):
        sl = slice(p * gs, (p + 1) * gs)
        b = q_ref[0, sl].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo = l8.astype(jnp.int8)                   # lo+8
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        xe = xe_ref[:, sl]
        pe = jax.lax.dot_general(xe, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        po = jax.lax.dot_general(xo_ref[:, sl], hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # excess-8 correction for the lo plane: dot(x, lo+8) - 8*rowsum(x)
        sxe = jnp.sum(xe.astype(jnp.float32), axis=1, keepdims=True) * 8.0
        acc = acc + (pe - sxe) * s_ref[0, 0, p, 0:1, :] \
                  + po * s_ref[0, 0, p, 1:2, :]
    acc_ref[:] = acc

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_n", "ppt"))
def _quant_matmul4(x, q, scales, layer, *, group_size, block_m, block_n,
                   ppt=1):
    """q [L, K/2, N] stacked packed weights; ``layer`` (scalar-prefetched)
    picks the layer — blocks are read straight from the stacked array, so a
    lax.scan over layers never slices (= copies) a weight tensor.
    ``ppt`` plane-pairs per k-tile (k-tile = ppt*2*gs logical rows)."""
    m, k = x.shape
    L, _, n = q.shape
    gs = group_size
    bk = 2 * gs * ppt
    assert k % bk == 0 and m % block_m == 0 and n % block_n == 0
    k_tiles = k // bk
    # parity split: even groups -> xe columns, odd groups -> xo columns;
    # each is [m, k/2] with pair p's slice at columns [p*gs, (p+1)*gs).
    xm = x.reshape(m, k // (2 * gs), 2, gs)
    xe = xm[:, :, 0, :].reshape(m, k // 2)
    xo = xm[:, :, 1, :].reshape(m, k // 2)
    scales5 = scales.reshape(L, k_tiles, ppt, 2, n)

    kernel = functools.partial(_qmm4_kernel, k_tiles=k_tiles, ppt=ppt, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_m, n // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, ppt * gs), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, ppt * gs), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ppt * gs, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ppt, 2, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, 0, 0, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda mt, nt, kt, lr: (mt, nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + (k // 2) * n + (scales.size // L) * 4
            + m * n * 2,
            transcendentals=0,
        ),
    )(layer.reshape(1), xe, xo, q, scales5)


# ----------------------------------------------------------------------
# W4A8: per-token int8 activation quant (outside the kernel) x int4
# plane-packed weights -> s8@s8 MXU dots.
#
# The v5e MXU runs int8 x int8 passes at ~2x the bf16 rate (probed:
# scripts/probe_mixed_dot2.py; docs/PERF.md round-5).  At decode the INT4
# matmul chain is PASS-bound, not byte-bound, so int8 activations halve
# the chain's floor.  Three lowerings were measured IN THE FULL 7B step
# (the only meter that doesn't lie here — solo kernel timings swung 1.5x
# between sessions):
#   per-token quant outside the kernel   23.50 ms/step  <- shipped
#   in-kernel quant per (row, group)     24.50 (VPU re-paid per n-tile)
#   in-kernel + persistent VMEM scratch  24.13 (dynamic-kt VMEM access)
#   bf16 activations (weight-only)       24.79
# The excess-8 plane correction stays exact in i32; the per-row
# activation scale multiplies the accumulator once in the epilogue via a
# lane-broadcast [M, 128] block.  i32 accumulate is mandatory (Mosaic
# rejects f32-accumulate s8 dots).  Dots whose contraction is < 256 rows
# lose the int8 double-pump (gs=128 measured 0.82x, gs=256 1.77x) —
# quantize weights at gs >= 256 for a8 (pad_free=False pads the 7B
# down-proj K to 19456 instead of shrinking gs).
# ----------------------------------------------------------------------


def quantize_activations(x: jax.Array):
    """Per-row (= per-token) symmetric int8 quantization of ``x [..., K]``.

    Returns ``(q int8 [..., K], scale f32 [..., 1])`` with
    ``x ~= q * scale``.  One VPU pass over x, shared by the W4A8/W8A8
    kernels and the XLA fallback."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return q, sx


def _qmm4_a8_kernel(layer_ref, xe_ref, xo_ref, q_ref, s_ref, sx_ref,
                     o_ref, acc_ref, *, k_tiles, ppt, gs):
    """INT4 x pre-quantized int8 activations (quantized per token OUTSIDE
    the kernel): two s8@s8 -> i32 dots per plane-pair, per-row activation
    scale in the epilogue.  The alternative a8 lowering (QIE_A8_IMPL=
    external): pays ~20 us/call of XLA quantize+parity glue but keeps the
    kernel free of the in-kernel VPU quant pass."""
    del layer_ref
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    for p in range(ppt):
        sl = slice(p * gs, (p + 1) * gs)
        b = q_ref[0, sl].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo8 = l8.astype(jnp.int8)
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        xe = xe_ref[:, sl]
        pe = jax.lax.dot_general(xe, lo8, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        po = jax.lax.dot_general(xo_ref[:, sl], hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        sxe = jnp.sum(xe.astype(jnp.int32), axis=1, keepdims=True) * 8
        acc = acc + ((pe - sxe).astype(jnp.float32) * s_ref[0, 0, p, 0:1, :]
                     + po.astype(jnp.float32) * s_ref[0, 0, p, 1:2, :])
    acc_ref[:] = acc

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:] * sx_ref[:, 0:1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_n", "ppt"))
def _quant_matmul4_a8(x, q, scales, layer, *, group_size, block_m,
                       block_n, ppt=1):
    """External-quant W4A8: per-token int8 quant + parity split in XLA,
    kernel consumes int8 planes + a lane-broadcast row scale."""
    m, k = x.shape
    L, _, n = q.shape
    gs = group_size
    k_tiles = k // (2 * gs * ppt)
    xq, sx = quantize_activations(x)
    sxb = jnp.broadcast_to(sx, (m, 128))
    xm = xq.reshape(m, k // (2 * gs), 2, gs)
    xe = xm[:, :, 0, :].reshape(m, k // 2)
    xo = xm[:, :, 1, :].reshape(m, k // 2)
    scales5 = scales.reshape(L, k_tiles, ppt, 2, n)

    kernel = functools.partial(_qmm4_a8_kernel, k_tiles=k_tiles, ppt=ppt,
                               gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_m, n // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, ppt * gs), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, ppt * gs), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ppt * gs, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ppt, 2, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, 0, 0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 128), lambda mt, nt, kt, lr: (mt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda mt, nt, kt, lr: (mt, nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(layer.reshape(1), xe, xo, q, scales5, sxb)


def _qmm8_a8_kernel(layer_ref, x_ref, q_ref, s_ref, sx_ref, o_ref, acc_ref,
                    *, k_tiles, per_tile):
    """INT8-weight kernel, int8 activations: one s8@s8 -> i32 dot per
    k-tile; weight scale per tile (or epilogue), activation scale in the
    epilogue."""
    del layer_ref
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot_general(x_ref[:], q_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    if per_tile:
        acc_ref[:] += part.astype(jnp.float32) * s_ref[0, 0]
    else:
        acc_ref[:] += part.astype(jnp.float32)

    @pl.when(kt == k_tiles - 1)
    def _():
        acc = acc_ref[:] * sx_ref[:, 0:1]
        if not per_tile:
            acc = acc * s_ref[0, 0]
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_k", "block_n"))
def _quant_matmul8_a8(x, sx, q, scales, layer, *, group_size, block_m,
                      block_k, block_n):
    m, k = x.shape
    L, _, n = q.shape
    groups = scales.shape[-2]
    k_tiles = k // block_k
    per_tile = groups > 1
    if per_tile:
        assert groups == k_tiles, (groups, k_tiles)
        s3 = scales.reshape(L, k_tiles, 1, n)
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda mt, nt, kt, lr: (lr[0], kt, 0, nt),
                              memory_space=pltpu.VMEM)
    else:
        s3 = scales.reshape(L, 1, 1, n)
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda mt, nt, kt, lr: (lr[0], 0, 0, nt),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_qmm8_a8_kernel, k_tiles=k_tiles,
                               per_tile=per_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_m, n // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, nt),
                         memory_space=pltpu.VMEM),
            s_spec,
            pl.BlockSpec((block_m, 128), lambda mt, nt, kt, lr: (mt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda mt, nt, kt, lr: (mt, nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + (scales.size // L) * 4
            + m * n * 2,
            transcendentals=0,
        ),
    )(layer.reshape(1), x, q, s3, sx)


# ----------------------------------------------------------------------
# INT8: single mixed dot per k-tile; scales per tile (gs == bk) or in the
# epilogue (per-channel, gs == K)
# ----------------------------------------------------------------------

def _qmm8_kernel(layer_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles,
                 per_tile):
    del layer_ref
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot_general(x_ref[:], q_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if per_tile:
        acc_ref[:] += part * s_ref[0, 0]
    else:
        acc_ref[:] += part

    @pl.when(kt == k_tiles - 1)
    def _():
        if per_tile:
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        else:
            o_ref[:] = (acc_ref[:] * s_ref[0, 0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_k", "block_n"))
def _quant_matmul8(x, q, scales, layer, *, group_size, block_m, block_k,
                   block_n):
    """q [L, K, N] stacked int8 weights; ``layer`` picks the layer via the
    BlockSpec index maps (no weight slicing in the layer scan)."""
    m, k = x.shape
    L, _, n = q.shape
    groups = scales.shape[-2]
    assert m % block_m == 0 and k % block_k == 0 and n % block_n == 0
    k_tiles = k // block_k
    per_tile = groups > 1
    if per_tile:
        assert groups == k_tiles, (groups, k_tiles)
        s3 = scales.reshape(L, k_tiles, 1, n)
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda mt, nt, kt, lr: (lr[0], kt, 0, nt),
                              memory_space=pltpu.VMEM)
    else:
        s3 = scales.reshape(L, 1, 1, n)
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda mt, nt, kt, lr: (lr[0], 0, 0, nt),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_qmm8_kernel, k_tiles=k_tiles, per_tile=per_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_m, n // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mt, nt, kt, lr: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, block_n),
                         lambda mt, nt, kt, lr: (lr[0], kt, nt),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda mt, nt, kt, lr: (mt, nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + (scales.size // L) * 4
            + m * n * 2,
            transcendentals=0,
        ),
    )(layer.reshape(1), x, q, s3)


# ----------------------------------------------------------------------
# Block selection + entry point
# ----------------------------------------------------------------------

_VMEM_BUDGET = 14 * 1024 * 1024


def _pick_bn(n: int, bm: int, weight_rows: int, *, int4: bool,
             gs: int = 0, extra_bytes: int = 0) -> int:
    """Largest 128-multiple divisor of n whose VMEM footprint fits.

    Footprint = double-buffered q block + in-kernel i32 unpack temporaries
    (for int4: ~6 bytes per packed value of one plane-pair, the loop body's
    live set) + x parity blocks + f32 accumulator + double-buffered output
    + scale slab.
    """
    best = 0
    temp_rows = gs if gs else weight_rows
    # the footprint model is calibrated (months of runs) at bm <= 128;
    # at larger M blocks Mosaic's unmodeled stack slack grows with bm and
    # a bm=240 lm-head verify compile measured 16.18M against the 16M
    # scoped limit with the est at 13.6M — shave the budget accordingly
    budget = _VMEM_BUDGET if bm <= 128 else _VMEM_BUDGET - 2 * 1024 * 1024
    budget -= extra_bytes
    for d in range(1, n // 128 + 1):
        bn = 128 * d
        if n % bn:
            continue
        vmem = (weight_rows * bn * 2          # q int8, double-buffered
                + (temp_rows * bn * 6 if int4 else 0)  # i32 unpack temps
                + (4 * bm * weight_rows * 2 if int4 else 0)  # xe/xo blocks
                + 16 * bn                     # scale slab (f32, 2-buffered)
                + bm * bn * 4                 # f32 acc scratch
                + bm * bn * 2 * 2)            # out bf16, double-buffered
        if vmem <= budget and bn > best:
            best = bn
    return best


def _pick_bm(m: int) -> int:
    if m <= 256:
        return m
    for bm in range(256, 7, -8):
        if m % bm == 0:
            return bm
    return 0


def quant_matmul_pallas(x: jax.Array, lin, layer=None,
                        block_override=None, act_bits: int = 0) -> jax.Array:
    """x [..., K] @ QuantLinear -> [..., N].

    ``lin`` may be a single layer (q ``[K/pack, N]``) or the whole stacked
    model (q ``[L, K/pack, N]``) with ``layer`` a traced scalar index: the
    kernel then reads layer blocks straight from the stacked array — inside
    a lax.scan over layers this avoids the per-iteration dynamic-slice that
    would otherwise copy every weight tensor every step.

    ``act_bits=8`` quantizes the activations per token and runs s8@s8 MXU
    dots (W4A8 / W8A8) — ~2x the bf16 pass rate on v5e, halving the
    pass-bound decode matmul floor.  The XLA shape-fallback implements the
    same numerics (linear._quant_matmul_xla), so accuracy gates run on any
    backend.

    Falls back to the XLA path for shapes the kernel doesn't tile."""
    stacked = lin.q.ndim == 3
    k = lin.in_features          # possibly padded by the quantizer
    k_x = x.shape[-1]            # the model's logical K
    n = lin.out_features
    gs = lin.group_size
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    m_pad = max(8, -(-m // 8) * 8)
    bm = _pick_bm(m_pad)
    ok = bm and n % 128 == 0 and k >= k_x
    if lin.bits == 4:
        ok = ok and k % (2 * gs) == 0 and gs % 128 == 0
    else:
        groups = lin.scales.shape[-2]
        ok = ok and (groups == 1 or (k % groups == 0 and (k // groups) % 128 == 0))
    if block_override is not None:
        bn = block_override[-1]
    elif ok:
        if lin.bits == 4:
            ppt0, kt0 = 1, k // (2 * gs)
            while kt0 > 20 and kt0 % 2 == 0 and ppt0 < 4:
                ppt0, kt0 = ppt0 * 2, kt0 // 2
            bn = _pick_bn(n, bm, ppt0 * gs, int4=True, gs=gs)
        else:
            bk = k if lin.scales.shape[-2] == 1 else k // lin.scales.shape[-2]
            bk = min(bk, 2048)
            while k % bk:
                bk //= 2
            bn = _pick_bn(n, bm, bk, int4=False)
        ok = bn > 0
    if not ok:
        lin2 = lin
        if stacked:
            import dataclasses as _dc

            lin2 = _dc.replace(lin, q=lin.q[layer], scales=lin.scales[layer],
                               b=None)
        return _linear._quant_matmul_xla(x, lin2, act_bits=act_bits)

    q3 = lin.q if stacked else lin.q[None]
    s3 = lin.scales if stacked else lin.scales[None]
    lidx = jnp.asarray(layer if stacked else 0, jnp.int32)

    x2 = x.reshape(m, k_x).astype(jnp.bfloat16)
    if m_pad != m or k != k_x:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k - k_x)))
    if lin.bits == 4:
        # shorten the serial k-tile accumulation chain for huge-K
        # projections by packing several plane-pairs into one tile
        ppt, kt = 1, k // (2 * gs)
        while kt > 20 and kt % 2 == 0 and ppt < 4:
            ppt, kt = ppt * 2, kt // 2
        if act_bits == 8:
            y = _quant_matmul4_a8(x2, q3, s3, lidx, group_size=gs,
                                  block_m=bm, block_n=bn, ppt=ppt)
        else:
            y = _quant_matmul4(x2, q3, s3, lidx, group_size=gs,
                               block_m=bm, block_n=bn, ppt=ppt)
    else:
        groups = lin.scales.shape[-2]
        if groups == 1:
            bk = min(k, 2048)
            while k % bk:
                bk //= 2
        else:
            bk = k // groups
        if act_bits == 8:
            xq, sx = quantize_activations(x2)
            sxb = jnp.broadcast_to(sx, (m_pad, 128))
            y = _quant_matmul8_a8(xq, sxb, q3, s3, lidx, group_size=gs,
                                  block_m=bm, block_k=bk, block_n=bn)
        else:
            y = _quant_matmul8(x2, q3, s3, lidx, group_size=gs,
                               block_m=bm, block_k=bk, block_n=bn)
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(x.dtype)
