"""Pallas grouped (MoE expert) weight-dequant matmul — INT4/INT8.

``y[M, N] = xs[M, K] @ dequant(Wq[e])[K, N]`` where the rows of ``xs`` are
(token, expert) pairs sorted by expert id and ``group_sizes[e]`` rows
belong to expert ``e`` (the layout produced by ``models.qwen.moe_mlp``).
For Qwen3-MoE the experts ARE the model (30B-A3B: 29B of 30.5B params),
so this kernel is the quantized-decode roofline setter exactly as
``ops/quant_matmul.py`` is for dense models; the reference has no MoE and
no quantization at all (its GEMM is the bf16 WMMA loop,
layers/src/matrix_mul.cu:165-288) — this is the baseline mandate's
"every dequant+matmul kernel" applied to the grouped case.

Design:

* **Work-item schedule, not per-expert M blocks.** Expert token counts
  are ragged and unbounded, so a static per-expert tile cap would either
  drop tokens (wrong) or waste passes. Instead the sorted row axis is cut
  into static ``TM``-row tiles and a work list of (row-tile, expert)
  pairs is built IN-GRAPH from ``group_sizes`` (cumsum + searchsorted —
  ~10 tiny VPU ops): one item per expert per row-tile it touches, at most
  ``M/TM + E`` items (static). Items beyond the actual count duplicate
  the last real item with an empty row range — identical block indices,
  so they trigger no new DMA traffic and add zero.
* **Each expert's weights stream exactly once** (plus one boundary
  revisit per straddled tile): the work item's expert id drives the
  weight BlockSpec via scalar prefetch, the grid runs the N dimension
  OUTERMOST so straddling items stay consecutive and their shared output
  tile never leaves VMEM between the two accumulating visits.
* **Same int4 plane-pair format as the dense kernel** (byte =
  ``16*hi + (lo+8)``, two mixed-input MXU dots per k-tile, post-dot group
  scales, excess-8 correction) — weights never touch the VPU, and one
  packer (quant/quantize.py) serves both kernels. Rows of ``xs`` that
  belong to a different expert than the work item are zeroed before the
  dot (their contribution lands in that expert's own item).

Decode cost model (30B-A3B, B=96, k=8, INT4): the full expert stream is
~300 MB/layer and bounds the step; the schedule's MXU passes
(~(M/TM + E) * K/128 * N/128) are ~0.3 ms/matmul — bandwidth-bound, as
required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------------------
# Work-list construction (in-graph; all static shapes)
# ----------------------------------------------------------------------

def _build_worklist(group_sizes: jax.Array, m_tiles: int, tm: int):
    """Per-work-item metadata arrays, each of static length W = m_tiles+E.

    Returns (expert_id, tile_id, row_start, row_end, first_visit), where
    item w processes sorted rows [row_start, row_end) of row-tile
    tile_id with expert expert_id's weights, and first_visit marks the
    first item touching its output tile (later items accumulate).
    """
    e = group_sizes.shape[0]
    w_total = m_tiles + e
    sizes = group_sizes.astype(jnp.int32)
    ends = jnp.cumsum(sizes)
    starts = ends - sizes
    first_tile = starts // tm
    last_tile = jnp.where(sizes > 0, (ends - 1) // tm, first_tile - 1)
    ntiles = jnp.maximum(last_tile - first_tile + 1, 0)
    cum = jnp.cumsum(ntiles)                       # inclusive
    n_work = cum[-1]

    w = jnp.arange(w_total, dtype=jnp.int32)
    # expert of item w: first e with cum[e] > w (only meaningful w < n_work)
    eid = jnp.searchsorted(cum, w, side="right").astype(jnp.int32)
    eid = jnp.minimum(eid, e - 1)
    w_off = cum - ntiles                           # exclusive cumsum
    tid = first_tile[eid] + (w - w_off[eid])
    rs = jnp.maximum(starts[eid], tid * tm)
    re = jnp.minimum(ends[eid], (tid + 1) * tm)
    # dead items: clone the last real item's blocks with an empty range
    last = jnp.maximum(n_work - 1, 0)
    dead = w >= n_work
    eid = jnp.where(dead, eid[last], eid)
    tid = jnp.where(dead, tid[last], tid)
    rs = jnp.where(dead, 0, rs)
    re = jnp.where(dead, 0, re)
    prev_tid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tid[:-1]])
    first = jnp.logical_and(tid != prev_tid, ~dead).astype(jnp.int32)
    return eid, tid, rs, re, first


# ----------------------------------------------------------------------
# INT4 kernel: plane-pair unpack + two mixed dots (see ops/quant_matmul.py)
# ----------------------------------------------------------------------

def _gmm4_kernel(eid_ref, tid_ref, rs_ref, re_ref, first_ref, layer_ref,
                 xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref,
                 *, k_tiles, ppt, gs, tm):
    del eid_ref, layer_ref  # consumed by the BlockSpec index maps
    w = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = tid_ref[w] * tm + jax.lax.broadcasted_iota(
        jnp.int32, (tm, 1), 0)
    valid = jnp.logical_and(row >= rs_ref[w], row < re_ref[w])

    acc = acc_ref[:]
    for p in range(ppt):
        sl = slice(p * gs, (p + 1) * gs)
        b = q_ref[0, 0, sl].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo = l8.astype(jnp.int8)                   # lo+8
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        xe = jnp.where(valid, xe_ref[:, sl], 0)
        xo = jnp.where(valid, xo_ref[:, sl], 0)
        pe = jax.lax.dot_general(xe, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        po = jax.lax.dot_general(xo, hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sxe = jnp.sum(xe.astype(jnp.float32), axis=1, keepdims=True) * 8.0
        acc = acc + (pe - sxe) * s_ref[0, 0, 0, p, 0:1, :] \
                  + po * s_ref[0, 0, 0, p, 1:2, :]
    acc_ref[:] = acc

    @pl.when(kt == k_tiles - 1)
    def _():
        @pl.when(first_ref[w] == 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        @pl.when(first_ref[w] == 0)
        def _():
            o_ref[:] = (o_ref[:].astype(jnp.float32)
                        + acc_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tm", "block_n",
                                             "ppt"))
def _grouped_matmul4(xs, q, scales, group_sizes, layer, *, group_size, tm,
                     block_n, ppt=1):
    """xs [M, K] sorted by expert; q [L, E, K/2, N] packed; scales
    [L, E, K/gs, N]. ``layer`` scalar-prefetched (stacked weights are
    never sliced)."""
    m, k = xs.shape
    L, E, _, n = q.shape
    gs = group_size
    bk = 2 * gs * ppt
    assert k % bk == 0 and m % tm == 0 and n % block_n == 0, (k, m, n)
    k_tiles = k // bk
    m_tiles = m // tm
    eid, tid, rs, re, first = _build_worklist(group_sizes, m_tiles, tm)
    w_items = int(eid.shape[0])

    xm = xs.reshape(m, k // (2 * gs), 2, gs)
    xe = xm[:, :, 0, :].reshape(m, k // 2)
    xo = xm[:, :, 1, :].reshape(m, k // 2)
    scales6 = scales.reshape(L, E, k_tiles, ppt, 2, n)

    kernel = functools.partial(_gmm4_kernel, k_tiles=k_tiles, ppt=ppt,
                               gs=gs, tm=tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // block_n, w_items, k_tiles),
        in_specs=[
            pl.BlockSpec((tm, ppt * gs),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ppt * gs),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ppt * gs, block_n),
                         lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                         (lr[0], eid[w], kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ppt, 2, block_n),
                         lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                         (lr[0], eid[w], kt, 0, 0, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, block_n),
                               lambda nt, w, kt, eid, tid, *_:
                               (tid[w], nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + E * (k // 2) * n
            + (scales.size // L) * 4 + m * n * 2,
            transcendentals=0,
        ),
    )(eid, tid, rs, re, first, jnp.asarray(layer, jnp.int32).reshape(1),
      xe, xo, q, scales6)


# ----------------------------------------------------------------------
# W4A8 kernel: int8 activation planes (quantized per token outside, like
# ops/quant_matmul's a8 path) x int4 plane pairs -> s8@s8 i32 dots at ~2x
# the bf16 MXU pass rate.  The grouped schedule's pass count is
# E_touched * K/128 * N/128 per matmul regardless of tokens-per-expert
# (every expert pays full M-tile passes for its ~B*k/E valid rows), so
# the int8 rate halves the dominant term of the MoE step (ablated:
# the 3 grouped matmuls are ~87% of the 30B-A3B decode step).
# ----------------------------------------------------------------------


def _gmm4_a8_kernel(eid_ref, tid_ref, rs_ref, re_ref, first_ref, layer_ref,
                    xe_ref, xo_ref, q_ref, s_ref, sx_ref, o_ref, acc_ref,
                    *, k_tiles, ppt, gs, tm):
    del eid_ref, layer_ref
    w = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = tid_ref[w] * tm + jax.lax.broadcasted_iota(
        jnp.int32, (tm, 1), 0)
    valid = jnp.logical_and(row >= rs_ref[w], row < re_ref[w])

    acc = acc_ref[:]
    for p in range(ppt):
        sl = slice(p * gs, (p + 1) * gs)
        b = q_ref[0, 0, sl].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo8 = l8.astype(jnp.int8)                  # lo+8
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        xe = jnp.where(valid, xe_ref[:, sl], 0)
        xo = jnp.where(valid, xo_ref[:, sl], 0)
        pe = jax.lax.dot_general(xe, lo8, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        po = jax.lax.dot_general(xo, hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        sxe = jnp.sum(xe.astype(jnp.int32), axis=1, keepdims=True) * 8
        acc = acc + ((pe - sxe).astype(jnp.float32) * s_ref[0, 0, 0, p, 0:1, :]
                     + po.astype(jnp.float32) * s_ref[0, 0, 0, p, 1:2, :])
    acc_ref[:] = acc

    @pl.when(kt == k_tiles - 1)
    def _():
        scaled = (acc_ref[:] * sx_ref[:, 0:1]).astype(o_ref.dtype)

        @pl.when(first_ref[w] == 1)
        def _():
            o_ref[:] = scaled

        @pl.when(first_ref[w] == 0)
        def _():
            o_ref[:] = (o_ref[:].astype(jnp.float32)
                        + scaled.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "tm", "block_n",
                                             "ppt"))
def _grouped_matmul4_a8(xs, q, scales, group_sizes, layer, *, group_size,
                        tm, block_n, ppt=1):
    """W4A8 grouped variant: xs quantized per token + parity-split here;
    weights/scales/worklist exactly as _grouped_matmul4."""
    from qwen_inference_engine_tpu.ops.quant_matmul import (
        quantize_activations,
    )

    m, k = xs.shape
    L, E, _, n = q.shape
    gs = group_size
    k_tiles = k // (2 * gs * ppt)
    m_tiles = m // tm
    eid, tid, rs, re, first = _build_worklist(group_sizes, m_tiles, tm)
    w_items = int(eid.shape[0])

    xq, sx = quantize_activations(xs)
    sxb = jnp.broadcast_to(sx, (m, 128))
    xm = xq.reshape(m, k // (2 * gs), 2, gs)
    xe = xm[:, :, 0, :].reshape(m, k // 2)
    xo = xm[:, :, 1, :].reshape(m, k // 2)
    scales6 = scales.reshape(L, E, k_tiles, ppt, 2, n)

    kernel = functools.partial(_gmm4_a8_kernel, k_tiles=k_tiles, ppt=ppt,
                               gs=gs, tm=tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // block_n, w_items, k_tiles),
        in_specs=[
            pl.BlockSpec((tm, ppt * gs),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ppt * gs),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ppt * gs, block_n),
                         lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                         (lr[0], eid[w], kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ppt, 2, block_n),
                         lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                         (lr[0], eid[w], kt, 0, 0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 128),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, block_n),
                               lambda nt, w, kt, eid, tid, *_:
                               (tid[w], nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + E * (k // 2) * n
            + (scales.size // L) * 4 + m * n * 2,
            transcendentals=0,
        ),
    )(eid, tid, rs, re, first, jnp.asarray(layer, jnp.int32).reshape(1),
      xe, xo, q, scales6, sxb)


# ----------------------------------------------------------------------
# INT8 kernel: one mixed dot per k-tile; per-channel or per-group scales
# ----------------------------------------------------------------------

def _gmm8_kernel(eid_ref, tid_ref, rs_ref, re_ref, first_ref, layer_ref,
                 x_ref, q_ref, s_ref, o_ref, acc_ref,
                 *, k_tiles, per_tile, tm):
    del eid_ref, layer_ref
    w = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = tid_ref[w] * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    valid = jnp.logical_and(row >= rs_ref[w], row < re_ref[w])
    x = jnp.where(valid, x_ref[:], 0)
    part = jax.lax.dot_general(x, q_ref[0, 0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if per_tile:
        acc_ref[:] += part * s_ref[0, 0, 0]
    else:
        acc_ref[:] += part

    @pl.when(kt == k_tiles - 1)
    def _():
        acc = acc_ref[:] if per_tile else acc_ref[:] * s_ref[0, 0, 0]

        @pl.when(first_ref[w] == 1)
        def _():
            o_ref[:] = acc.astype(o_ref.dtype)

        @pl.when(first_ref[w] == 0)
        def _():
            o_ref[:] = (o_ref[:].astype(jnp.float32) + acc).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "block_k", "block_n"))
def _grouped_matmul8(xs, q, scales, group_sizes, layer, *, tm, block_k,
                     block_n):
    """xs [M, K]; q [L, E, K, N] int8; scales [L, E, groups, N]."""
    m, k = xs.shape
    L, E, _, n = q.shape
    groups = scales.shape[-2]
    assert m % tm == 0 and k % block_k == 0 and n % block_n == 0
    k_tiles = k // block_k
    per_tile = groups > 1
    if per_tile:
        assert groups == k_tiles, (groups, k_tiles)
    m_tiles = m // tm
    eid, tid, rs, re, first = _build_worklist(group_sizes, m_tiles, tm)
    w_items = int(eid.shape[0])
    s4 = scales.reshape(L, E, groups, n)
    if per_tile:
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                              (lr[0], eid[w], kt, nt),
                              memory_space=pltpu.VMEM)
    else:
        s_spec = pl.BlockSpec((1, 1, 1, block_n),
                              lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                              (lr[0], eid[w], 0, nt),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_gmm8_kernel, k_tiles=k_tiles,
                               per_tile=per_tile, tm=tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n // block_n, w_items, k_tiles),
        in_specs=[
            pl.BlockSpec((tm, block_k),
                         lambda nt, w, kt, eid, tid, *_: (tid[w], kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, block_n),
                         lambda nt, w, kt, eid, tid, rs, re, fv, lr:
                         (lr[0], eid[w], kt, nt),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((tm, block_n),
                               lambda nt, w, kt, eid, tid, *_:
                               (tid[w], nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + E * k * n
            + (scales.size // L) * 4 + m * n * 2,
            transcendentals=0,
        ),
    )(eid, tid, rs, re, first, jnp.asarray(layer, jnp.int32).reshape(1),
      xs, q, s4)


# ----------------------------------------------------------------------
# Entry point
# ----------------------------------------------------------------------

_VMEM_BUDGET = 14 * 1024 * 1024
_TM = 128


def _pick_bn(n: int, tm: int, weight_rows: int, *, int4: bool,
             gs: int = 0) -> int:
    """Largest 128-multiple divisor of n that fits VMEM (mirrors
    ops/quant_matmul._pick_bn's footprint model)."""
    best = 0
    temp_rows = gs if gs else weight_rows
    for d in range(1, n // 128 + 1):
        bn = 128 * d
        if n % bn:
            continue
        vmem = (weight_rows * bn * 2
                + (temp_rows * bn * 6 if int4 else 0)
                + (4 * tm * weight_rows * 2 if int4 else 0)
                + 16 * bn
                + tm * bn * 4
                + tm * bn * 2 * 2)
        if vmem <= _VMEM_BUDGET and bn > best:
            best = bn
    return best


def grouped_quant_matmul_supported(qe, n_rows: int) -> bool:
    """Shape gate for the Pallas grouped kernels (qe: QuantExperts)."""
    k = qe.in_features
    n = qe.out_features
    gs = qe.group_size
    if n % 128 != 0:
        return False
    if qe.bits == 4:
        if k % (2 * gs) or gs % 128:
            return False
        return _pick_bn(n, _TM, gs, int4=True, gs=gs) > 0
    groups = qe.scales.shape[-2]
    if groups > 1 and (k % groups or (k // groups) % 128):
        return False
    return _pick_bn(n, _TM, min(k, 2048), int4=False) > 0


def grouped_quant_matmul(xs: jax.Array, qe, group_sizes: jax.Array,
                         layer=None, act_bits: int = 0) -> jax.Array:
    """xs [M, K] (rows sorted by expert) @ QuantExperts -> [M, N].

    ``qe.q`` may be single-layer ``[E, K/pack, N]`` or stacked
    ``[L, E, K/pack, N]`` with ``layer`` a traced index (scalar-prefetched,
    so a lax.scan over layers never copies the expert weights).
    ``act_bits=8`` (INT4 weights only) runs the W4A8 variant — per-token
    int8 activations, s8@s8 i32 dots at ~2x the bf16 pass rate.
    """
    stacked = qe.q.ndim == 4
    k = qe.in_features
    m, k_x = xs.shape
    n = qe.out_features
    gs = qe.group_size
    q4 = qe.q if stacked else qe.q[None]
    s4 = qe.scales if stacked else qe.scales[None]
    lidx = jnp.asarray(layer if stacked else 0, jnp.int32)

    m_pad = -(-m // _TM) * _TM
    x2 = xs.astype(jnp.bfloat16)
    if m_pad != m or k != k_x:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k - k_x)))
    if qe.bits == 4:
        ppt, kt = 1, k // (2 * gs)
        while kt > 20 and kt % 2 == 0 and ppt < 4:
            ppt, kt = ppt * 2, kt // 2
        # Small-K experts (decode MoE): the grid runs W ~ E work items, so
        # per-cell overhead x k_tiles dominates (measured: 3 matmuls = 89%
        # of the 30B-A3B step, ~0.4 us x 520 cells/matmul/layer; r5
        # ablation). Merge the whole plane-pair chain into one k-tile
        # while the weight block still fits VMEM.
        while (kt % 2 == 0
               and _pick_bn(n, _TM, 2 * ppt * gs, int4=True, gs=gs) > 0):
            ppt, kt = ppt * 2, kt // 2
        bn = _pick_bn(n, _TM, ppt * gs, int4=True, gs=gs)
        if act_bits == 8:
            y = _grouped_matmul4_a8(x2, q4, s4, group_sizes, lidx,
                                    group_size=gs, tm=_TM, block_n=bn,
                                    ppt=ppt)
        else:
            y = _grouped_matmul4(x2, q4, s4, group_sizes, lidx,
                                 group_size=gs, tm=_TM, block_n=bn, ppt=ppt)
    else:
        groups = qe.scales.shape[-2]
        if groups == 1:
            bk = min(k, 2048)
            while k % bk:
                bk //= 2
        else:
            bk = k // groups
        bn = _pick_bn(n, _TM, bk, int4=False)
        y = _grouped_matmul8(x2, q4, s4, group_sizes, lidx, tm=_TM,
                             block_k=bk, block_n=bn)
    if m_pad != m:
        y = y[:m]
    return y.astype(xs.dtype)
