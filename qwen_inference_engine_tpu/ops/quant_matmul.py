"""Pallas fused weight-dequant (INT8/INT4) matmul — the north-star kernel.

Computes ``y[M,N] = x[M,K] @ dequant(Wq)[K,N]`` reading only the packed int
bytes (+ scales) from HBM.  At decode (M small) every weight byte is read
exactly once per step, so this kernel sets the decode throughput roofline
(BASELINE.md: ≥85% of INT4 roofline).

Design notes (what makes it fast at small M):
* **post-dot scaling** — group scales multiply the ``[bm, bn]`` partial
  product after the MXU contraction, not the ``[group, bn]`` weight slab:
  ``y += (x_g @ w_g) * s_g``.  At decode M this is ~group_size× less VPU
  work than scaling the weights, leaving only the unavoidable int→bf16
  cast per weight element.
* **group-pair INT4 layout** (see ops/linear.py) — each nibble plane of a
  packed slab is one whole scale group, so its activation slice is a
  lane-aligned 128-column window of x and unpacking needs no shuffles:
  ``y += (x_lo @ lo(q)) * s_{2p} + (x_hi @ hi(q)) * s_{2p+1}``.
* **large-ish tiles** — empirically on v5e (scripts/sweep_qmm.py) bn=512
  with bk up to 2048 wins; grid cells cost ~µs fixed overhead but very
  wide tiles thrash VMEM.
* **M-tiling** — prefill M (batch×tokens) is blocked at 256 rows so the
  same kernel serves decode (M=8..64, single tile) and prefill (M in the
  thousands) without VMEM blowups.

Grid: (M/bm, N/bn, K/bk), K innermost, fp32 VMEM accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen_inference_engine_tpu.ops import linear as _linear


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, bits, group_size,
                k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gs = group_size
    acc = acc_ref[:]
    if bits == 8:
        for g in range(block_k // gs):
            w = q_ref[g * gs:(g + 1) * gs, :].astype(jnp.bfloat16)
            part = jnp.dot(x_ref[:, g * gs:(g + 1) * gs], w,
                           preferred_element_type=jnp.float32)
            acc = acc + part * s_ref[0, g]
    else:
        # packed slab rows [p*gs, (p+1)*gs) hold groups 2p (lo) / 2p+1 (hi)
        for p in range(block_k // (2 * gs)):
            slab = q_ref[p * gs:(p + 1) * gs, :]
            lo, hi = _linear.unpack_nibbles(slab)
            x_lo = x_ref[:, (2 * p) * gs:(2 * p + 1) * gs]
            x_hi = x_ref[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
            part_lo = jnp.dot(x_lo, lo.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            part_hi = jnp.dot(x_hi, hi.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            acc = acc + part_lo * s_ref[0, 2 * p] + part_hi * s_ref[0, 2 * p + 1]
    acc_ref[:] = acc

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_m",
                                             "block_k", "block_n"))
def _quant_matmul_2d(x, q, scales, *, bits, group_size, block_m, block_k, block_n):
    m, k = x.shape
    n = q.shape[-1]
    k_packed = q.shape[0]
    pack = 2 if bits == 4 else 1
    assert k_packed * pack == k, (k_packed, pack, k)
    assert m % block_m == 0 and k % block_k == 0 and n % block_n == 0
    assert block_k % group_size == 0
    m_tiles = m // block_m
    k_tiles = k // block_k
    n_tiles = n // block_n
    sg = group_size
    gpb = block_k // sg  # scale groups per K block
    # [K/sg, N] → [k_tiles, gpb, N]: per-block scale slab whose middle dim
    # equals the block's, satisfying the Mosaic (8,128)-or-full tile rule.
    scales3 = scales.reshape(k_tiles, gpb, n)

    grid = (m_tiles, n_tiles, k_tiles)
    kernel = functools.partial(
        _qmm_kernel, bits=bits, group_size=sg, k_tiles=k_tiles, block_k=block_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mt, nt, kt: (mt, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // pack, block_n), lambda mt, nt, kt: (kt, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb, block_n), lambda mt, nt, kt: (kt, 0, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mt, nt, kt: (mt, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k_packed * n + (k // sg) * n * 4 + m * n * 2,
            transcendentals=0,
        ),
    )(x, q, scales3)


def _divisors_desc(n, lo, hi):
    return [d for d in range(min(hi, n), lo - 1, -1) if n % d == 0]


def _pick_blocks(m, k, n, bits, group_size):
    """(block_m, block_k, block_n) dividing (m, k, n), group/pack aligned,
    within a VMEM budget (double-buffered). Empirical on v5e
    (scripts/sweep_qmm.py): bn=512, bk up to ~2048."""
    pack = 2 if bits == 4 else 1
    pair = 2 * group_size if bits == 4 else group_size
    bm = m if m <= 256 else next(
        (d for d in range(256, 7, -8) if m % d == 0), None)
    if bm is None:
        return None

    def vmem(bk, bn):
        x_b = bm * bk * 2
        q_b = (bk // pack) * bn
        s_b = (bk // group_size) * bn * 4
        w_slab = group_size * bn * 2 * (2 if bits == 4 else 1)
        acc = bm * bn * 4 + bm * bn * 2
        return (x_b + q_b + s_b) * 2 + w_slab + acc  # in/out double-buffered

    best = None
    for bn in _divisors_desc(n, 128, 512):
        if bn % 128:
            continue
        for bk in _divisors_desc(k, pair, 2048):
            if bk % pair:
                continue
            if vmem(bk, bn) > 10 * 1024 * 1024:
                continue
            score = (-(bk * bn), -bn)
            if best is None or score < best[0]:
                best = (score, bk, bn)
            break  # largest feasible bk for this bn
    if best is None:
        return None
    return bm, best[1], best[2]


def quant_matmul_pallas(x: jax.Array, lin, block_override=None) -> jax.Array:
    """x [..., K] @ QuantLinear -> [..., N]; falls back to the XLA path for
    shapes the kernel doesn't tile (unaligned K/N)."""
    k = lin.in_features
    n = lin.out_features
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    # pad M up to the sublane multiple the kernel blocks need
    m_pad = max(8, -(-m // 8) * 8)
    if block_override is not None:
        blocks = (m_pad, *block_override)
    else:
        blocks = _pick_blocks(m_pad, k, n, lin.bits, lin.group_size)
    if blocks is None:
        return _linear._quant_matmul_xla(x, lin)
    bm, bk, bn = blocks
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    y = _quant_matmul_2d(
        x2, lin.q, lin.scales, bits=lin.bits, group_size=lin.group_size,
        block_m=bm, block_k=bk, block_n=bn,
    )
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(x.dtype)
