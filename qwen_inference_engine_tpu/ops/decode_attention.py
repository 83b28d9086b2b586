"""Flash decode attention over the STACKED contiguous KV cache.

The decode hot path keeps the whole [L, B, Hk, S, D] cache as a scan carry
(models/qwen.py). Slicing layer ``l`` out with a dynamic-slice materializes
a full copy of the layer's KV before the attention einsum can read it —
measured ~10 ms/step at 7B batch 128 (ablation in scripts/ablate_decode.py).
This kernel instead reads the layer's KV blocks straight out of the stacked
HBM array: the layer index rides in scalar-prefetch and the BlockSpec index
map addresses ``(layer, b, h, s_block)`` directly, so Mosaic's pipeline DMAs
exactly the bytes attention needs, double-buffered, with zero staging copy.

Online-softmax (flash) accumulation over S blocks, one (batch, kv-head)
pair per grid row; GQA query heads of a group ride in the sublane dim.

Replaces (for the contiguous cache) the reference's single-sequence fused
attention kernel (reference: layers/src/self_attension.cu:10-149) — where
the reference walks a UVM page list per key token and runs softmax serially
on thread 0, this streams K/V at HBM bandwidth and keeps the softmax in
vector registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _decode_kernel(lens_ref, layer_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, m_ref, l_ref, *, block_s, scale):
    b = pl.program_id(0)
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = lens_ref[b]

    @pl.when(sb * block_s < length)
    def _():
        q = q_ref[0, 0]                        # [G8, D]
        k = k_ref[0, 0, 0]                     # [BS, D]
        v = v_ref[0, 0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G8, BS]
        kpos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(kpos < length, s, _NEG_INF)

        m_prev = m_ref[:]                      # [G8, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                 # [G8, BS]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [G8, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def decode_attention_supported(head_dim: int, max_seq: int, num_heads: int,
                               num_kv_heads: int) -> bool:
    g = num_heads // num_kv_heads
    return head_dim % 128 == 0 and g <= 8 and max_seq % 256 == 0


def _pick_block_s(s: int) -> int:
    # 256 balances per-cell overhead against the fetch granularity of the
    # clamped index map (blocks past a row's length are never DMA'd, so
    # bs bounds the over-fetch at the ragged edge).
    for bs in (256, 512, 128):
        if s % bs == 0:
            return bs
    return 0


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention(lens, layer, q8, k_cache, v_cache, *, scale):
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    grid = (B, Hk, S // bs)
    def kv_index(b, h, sb, lens_ref, layer_ref):
        # clamp to the last block this row actually needs: Mosaic's
        # pipeline skips the DMA when the block index repeats, so blocks
        # past the valid length are fetched zero times (their compute is
        # skipped via pl.when on the same bound).
        last = jnp.maximum(lens_ref[b] - 1, 0) // bs
        return (layer_ref[0], b, h, jnp.minimum(sb, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G8, D),
                         lambda b, h, sb, lens_ref, layer_ref: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, bs, D), kv_index),
            pl.BlockSpec((1, 1, 1, bs, D), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G8, D), lambda b, h, sb, lens_ref, layer_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G8, D), jnp.float32),
            pltpu.VMEM((G8, 1), jnp.float32),
            pltpu.VMEM((G8, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel, block_s=bs, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * D * k_cache.dtype.itemsize,
            transcendentals=B * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache)


def decode_attention_contiguous(
    q: jax.Array,          # [B, 1, Hq, D] current-step queries
    k_cache: jax.Array,    # [L, B, Hk, S, D] stacked head-major cache
    v_cache: jax.Array,
    layer: jax.Array,      # scalar int32
    lengths: jax.Array,    # [B] valid kv length per row (position + 1)
    scale: float | None = None,
) -> jax.Array:
    """Returns [B, 1, Hq, D] in q.dtype."""
    B, T, Hq, D = q.shape
    assert T == 1, T
    Hk = k_cache.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    out = _decode_attention(lengths.astype(jnp.int32),
                            jnp.asarray(layer, jnp.int32).reshape(1),
                            qg, k_cache, v_cache, scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D)


# ----------------------------------------------------------------------
# INT8-KV variant: k/v blocks stay int8 end-to-end (mixed-input MXU dots);
# per-token-per-head scales are applied to the f32 score rows (K) and
# folded into the probabilities before the PV dot (V) — the cache is never
# dequantized in HBM or VMEM.
# ----------------------------------------------------------------------

def _decode_kernel_q8(lens_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref,
                      vs_ref, o_ref, acc_ref, m_ref, l_ref, *, block_s, scale):
    b = pl.program_id(0)
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = lens_ref[b]

    @pl.when(sb * block_s < length)
    def _():
        q = q_ref[0, 0]                        # [G8, D] bf16
        k = k_ref[0, 0, 0]                     # [BS, D] int8
        ks = ks_ref[0, 0, 0]                   # [BS] f32
        vs = vs_ref[0, 0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * (ks[None, :] * scale)          # dequant K post-dot
        kpos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(kpos < length, s, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            (p * vs[None, :]).astype(jnp.bfloat16), v_ref[0, 0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # dequant V folded into P
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention_q8(lens, layer, q8, k_cache, v_cache, k_scale, v_scale,
                         *, scale):
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    grid = (B, Hk, S // bs)

    def kv_index(b, h, sb, lens_ref, layer_ref):
        last = jnp.maximum(lens_ref[b] - 1, 0) // bs
        return (layer_ref[0], b, h, jnp.minimum(sb, last), 0)

    def s_index(b, h, sb, lens_ref, layer_ref):
        last = jnp.maximum(lens_ref[b] - 1, 0) // bs
        return (layer_ref[0], b, h, jnp.minimum(sb, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G8, D),
                         lambda b, h, sb, lens_ref, layer_ref: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, bs, D), kv_index),
            pl.BlockSpec((1, 1, 1, bs, D), kv_index),
            pl.BlockSpec((1, 1, 1, bs), s_index),
            pl.BlockSpec((1, 1, 1, bs), s_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G8, D), lambda b, h, sb, lens_ref, layer_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G8, D), jnp.float32),
            pltpu.VMEM((G8, 1), jnp.float32),
            pltpu.VMEM((G8, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel_q8, block_s=bs, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * (D + 4),
            transcendentals=B * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache, k_scale, v_scale)


def decode_attention_contiguous_q8(
    q: jax.Array,          # [B, 1, Hq, D]
    k_cache: jax.Array,    # [L, B, Hk, S, D] int8
    v_cache: jax.Array,
    k_scale: jax.Array,    # [L, B, Hk, S] f32
    v_scale: jax.Array,
    layer: jax.Array,
    lengths: jax.Array,    # [B]
    scale: float | None = None,
) -> jax.Array:
    """INT8-KV flash decode over the stacked cache. Returns [B, 1, Hq, D]."""
    B, T, Hq, D = q.shape
    assert T == 1, T
    Hk = k_cache.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, Hk, G, D).astype(jnp.bfloat16)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    out = _decode_attention_q8(lengths.astype(jnp.int32),
                               jnp.asarray(layer, jnp.int32).reshape(1),
                               qg, k_cache, v_cache, k_scale, v_scale,
                               scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)
