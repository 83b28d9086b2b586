"""Pallas fused weight-dequant (INT8/INT4) matmul — the north-star kernel.

Computes ``y[M,N] = x[M,K] @ dequant(Wq)[K,N]`` with the int weights
dequantized **in VMEM, per K×N block**, so HBM traffic is the packed int
bytes (+ scales), never the bf16 weight.  At decode (M small) every weight
byte is read exactly once per step, so this kernel sets the decode
throughput roofline (BASELINE.md: ≥85% of INT4 roofline).

Grid: (N/BN, K/BK) with K innermost, accumulating into an fp32 VMEM
scratch; the M axis stays un-tiled (decode M ≤ batch, prefill M ≤ a few
thousand rows — fits VMEM alongside the weight block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen_inference_engine_tpu.ops import linear as _linear


def _dequant_block(q_blk, s_blk, bits: int, group_size: int) -> jax.Array:
    """Unpack+scale one weight block to bf16 in VMEM.

    q_blk: int8 [BKp, BN] (BKp = BK for int8, BK//2 packed rows for int4)
    s_blk: fp32 [BK//group_size, BN]
    """
    if bits == 4:
        w = _linear.unpack_int4(q_blk, group_size)  # [BK, BN] int8 in [-8,7]
    else:
        w = q_blk
    bk, bn = w.shape
    groups = s_blk.shape[0]
    wf = w.astype(jnp.float32).reshape(groups, bk // groups, bn)
    wf = wf * s_blk[:, None, :]
    return wf.reshape(bk, bn).astype(jnp.bfloat16)


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, bits, group_size, k_tiles):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _dequant_block(q_ref[:], s_ref[0], bits, group_size)
    acc_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "block_k", "block_n"))
def _quant_matmul_2d(x, q, scales, *, bits, group_size, block_k, block_n):
    m, k = x.shape
    n = q.shape[-1]
    k_packed = q.shape[0]
    pack = 2 if bits == 4 else 1
    assert k_packed * pack == k, (k_packed, pack, k)
    assert k % block_k == 0 and n % block_n == 0, (k, n, block_k, block_n)
    assert block_k % group_size == 0
    k_tiles = k // block_k
    n_tiles = n // block_n
    sg = group_size
    gpb = block_k // sg  # scale groups per K block
    # [K/sg, N] → [k_tiles, gpb, N]: per-block scale slab whose middle dim
    # equals the block's, satisfying the Mosaic (8,128)-or-full tile rule.
    scales3 = scales.reshape(k_tiles, gpb, n)

    grid = (n_tiles, k_tiles)
    kernel = functools.partial(
        _qmm_kernel, bits=bits, group_size=sg, k_tiles=k_tiles
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_k), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_k // pack, block_n), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gpb, block_n), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k_packed * n + (k // sg) * n * 4 + m * n * 2,
            transcendentals=0,
        ),
    )(x, q, scales3)


def _pick_blocks(m, k, n, bits, group_size):
    """Pick (block_k, block_n) that divide (k, n), respect group alignment,
    and keep x-block + w-block + acc within a conservative VMEM budget."""
    pack = 2 if bits == 4 else 1

    def fits(bk, bn):
        x_b = m * bk * 2
        w_b = (bk // pack) * bn + (bk // group_size) * bn * 4 + bk * bn * 2
        acc = m * bn * 4 + m * bn * 2
        return (x_b + w_b + acc) * 2 < 10 * 1024 * 1024  # double-buffered

    for bn in (1024, 512, 256, 128):
        if n % bn:
            continue
        for bk in (2048, 1024, 512, 256, group_size):
            if k % bk or bk % group_size or (bits == 4 and bk % (2 * group_size)):
                continue
            if fits(bk, bn):
                return bk, bn
    return None


def quant_matmul_pallas(x: jax.Array, lin) -> jax.Array:
    """x [..., K] @ QuantLinear -> [..., N]; falls back to the XLA path for
    shapes the kernel doesn't tile (unaligned K/N)."""
    k = lin.in_features
    n = lin.out_features
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    # pad M up to the fp32-sublane multiple the kernel output needs
    m_pad = max(8, -(-m // 8) * 8)
    blocks = _pick_blocks(m_pad, k, n, lin.bits, lin.group_size)
    if blocks is None:
        return _linear._quant_matmul_xla(x, lin)
    bk, bn = blocks
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    y = _quant_matmul_2d(
        x2, lin.q, lin.scales, bits=lin.bits, group_size=lin.group_size,
        block_k=bk, block_n=bn,
    )
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(x.dtype)
