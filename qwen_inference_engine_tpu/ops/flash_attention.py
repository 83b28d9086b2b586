"""Pallas flash attention (causal, GQA) for prefill.

TPU-native replacement for the reference's fused attention kernel
(reference: layers/src/self_attension.cu:10-149), which materializes the
whole score row in shared memory (smem = seq_len·4B — caps context at ~48k,
SURVEY.md §5.7) and runs the softmax serially on thread 0.  Here: classic
blockwise online-softmax (flash) — scores only ever exist as a
[block_q, block_k] VMEM tile, so context length is bounded by HBM not VMEM,
and the softmax is fully vectorized on the VPU between MXU tiles.

Layout: q/k/v arrive [B, H, T, D] (head-major) so the innermost block is a
[block_t, D] tile — lane-aligned for D=128.  GQA is expressed in the index
map (kv head = q head // group) — no K/V duplication in HBM or VMEM.

Causal blocks strictly above the diagonal are skipped via pl.when.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale, block_q, block_k, k_tiles):
    qt = pl.program_id(2)
    st = pl.program_id(3)

    @pl.when(st == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # blocks strictly above the causal diagonal contribute nothing
    @pl.when(st * block_k <= qt * block_q + block_q - 1)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale        # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)                # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [bq, bk]
        q_pos = qt * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = st * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_pos <= q_pos, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]                             # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                             # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                    # [bq, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        v = v_ref[0, 0].astype(jnp.float32)                # [bk, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(st == k_tiles - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bhtd(q, k, v, *, scale, block_q, block_k):
    B, Hq, T, D = q.shape
    Hk, S = k.shape[1], k.shape[2]
    G = Hq // Hk
    q_tiles = T // block_q
    k_tiles = S // block_k
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k,
        k_tiles=k_tiles)
    return pl.pallas_call(
        kernel,
        grid=(B, Hq, q_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qt, st: (b, h, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, qt, st: (b, h // G, st, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, qt, st: (b, h // G, st, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qt, st: (b, h, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * S * D // 2,  # causal halves the work
            bytes_accessed=(B * Hq * T * D + 2 * B * Hk * S * D) * 2,
            transcendentals=B * Hq * T * S // 2,
        ),
    )(q, k, v)


def flash_attention_supported(q_shape, k_shape, block_q=256, block_k=256) -> bool:
    B, T, Hq, D = q_shape
    S, Hk = k_shape[1], k_shape[2]
    return (
        D % 128 == 0
        and T % min(block_q, T) == 0
        and S % min(block_k, S) == 0
        and T >= 8 and S >= 8
        and Hq % Hk == 0
    )


def flash_attention(
    q: jax.Array,           # [B, T, Hq, D]
    k: jax.Array,           # [B, S, Hk, D]
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Causal GQA flash attention for fresh prefill (positions 0..T-1).

    Semantics match ops.attention.gqa_attention with positions=iota (the
    test oracle). Returns [B, T, Hq, D].
    """
    B, T, Hq, D = q.shape
    if scale is None:
        scale = D ** -0.5
    bq = min(block_q, T)
    bk = min(block_k, k.shape[1])
    out = _flash_bhtd(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        scale=float(scale), block_q=bq, block_k=bk,
    )
    return out.swapaxes(1, 2)
