"""Flash attention for chunked-prefill CONTINUATION chunks.

Chunk i of a chunked prefill attends its T fresh queries (absolute
positions [start, start+T)) over the cache prefix [0, start+T) — the
chunk's own keys are already written. The XLA fallback allocates the
[B, Hk, G, T, S] score block per layer (2.1 GB at 7B b96 T=128 S=1536),
which is what capped the chunk size at 64 and with it the prefill's
per-chunk overhead; this kernel streams the stacked cache block-by-block
with online softmax — peak memory is one KV block — and packs M = T·G8
query rows per dot (the MXU-efficient regime decode can't reach).

Causality is by absolute position: key blocks entirely before ``start``
take no mask; only blocks overlapping the query range take the triangle.

Reference lineage: the reference's prefill attention materializes every
score row in shared memory (reference: layers/src/self_attension.cu:
15,79 — the SURVEY §5.7 anti-pattern); this is the TPU-native fix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _chunk_kernel(start_ref, layer_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, block_s, scale, n_kv, G8, T):
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    start = start_ref[pl.program_id(0)]   # per-row start (ragged rows ok)
    end = start + T                      # keys valid in [0, end)
    TG = T * G8
    D = q_ref.shape[4]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb * block_s < end)
    def _():
        needs_mask = (sb + 1) * block_s > start
        kpos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (TG, block_s), dimension=1)
        qpos = start + jax.lax.broadcasted_iota(
            jnp.int32, (TG, block_s), dimension=0) // G8
        hide = jnp.logical_and(needs_mask, kpos > qpos)
        for h in range(n_kv):
            # [T, G8, D] -> [T*G8, D] query rows for this kv head
            q = q_ref[0, :, h].reshape(TG, D)
            k = k_ref[0, 0, h]                             # [bs, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(hide, _NEG_INF, s)

            sl = slice(h * TG, (h + 1) * TG)
            m_prev = m_ref[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[sl] = m_new
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[0, 0, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom                          # [Hk*T*G8, D]
        o_ref[0] = out.reshape(n_kv, T, G8, D).swapaxes(0, 1).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _chunk_attention(start, layer, qg, k_cache, v_cache, *, scale):
    B, T, Hk, G8, D = qg.shape
    S = k_cache.shape[3]
    bs = 512 if S % 512 == 0 else 256
    TG = T * G8

    def kv_index(b, sb, start_ref, layer_ref):
        # clamp to the last needed block: repeats skip the DMA
        last = (start_ref[b] + T - 1) // bs
        return (layer_ref[0], b, 0, jnp.minimum(sb, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S // bs),
        in_specs=[
            pl.BlockSpec((1, T, Hk, G8, D),
                         lambda b, sb, start, layer: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hk, bs, D), kv_index),
            pl.BlockSpec((1, 1, Hk, bs, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, T, Hk, G8, D),
                               lambda b, sb, start, layer: (b, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * TG, D), jnp.float32),
            pltpu.VMEM((Hk * TG, 1), jnp.float32),
            pltpu.VMEM((Hk * TG, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_chunk_kernel, block_s=bs, scale=scale,
                               n_kv=Hk, G8=G8, T=T)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hk, G8, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * TG * S * D,
            bytes_accessed=2 * B * Hk * S * D * k_cache.dtype.itemsize,
            transcendentals=B * Hk * TG * S,
        ),
    )(start, layer, qg, k_cache, v_cache)


def _chunk_kernel_q8(start_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref,
                     vs_ref, o_ref, acc_ref, m_ref, l_ref, *, block_s,
                     scale, n_kv, G8, T):
    """INT8-KV variant: mixed-input bf16×int8 dots run at the MXU pass
    floor (never a VPU dequant); per-token scales fold into the scores /
    probabilities exactly as in ops/decode_attention._decode_kernel_q8."""
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    start = start_ref[pl.program_id(0)]   # per-row start (ragged rows ok)
    end = start + T
    TG = T * G8
    D = q_ref.shape[4]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb * block_s < end)
    def _():
        needs_mask = (sb + 1) * block_s > start
        kpos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (TG, block_s), dimension=1)
        qpos = start + jax.lax.broadcasted_iota(
            jnp.int32, (TG, block_s), dimension=0) // G8
        hide = jnp.logical_and(needs_mask, kpos > qpos)
        for h in range(n_kv):
            q = q_ref[0, :, h].reshape(TG, D)              # bf16
            k = k_ref[0, 0, h]                             # [bs, D] int8
            ks = ks_ref[0, 0, h]                           # [bs] f32
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (ks[None, :] * scale)
            s = jnp.where(hide, _NEG_INF, s)

            sl = slice(h * TG, (h + 1) * TG)
            m_prev = m_ref[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[sl] = m_new
            pb = (p * vs_ref[0, 0, h][None, :]).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                pb, v_ref[0, 0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom
        o_ref[0] = out.reshape(n_kv, T, G8, D).swapaxes(0, 1).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _chunk_attention_q8(start, layer, qg, k_cache, v_cache, k_scale,
                        v_scale, *, scale):
    B, T, Hk, G8, D = qg.shape
    S = k_cache.shape[3]
    bs = 512 if S % 512 == 0 else 256
    TG = T * G8

    def kv_index(b, sb, start_ref, layer_ref):
        last = (start_ref[b] + T - 1) // bs
        return (layer_ref[0], b, 0, jnp.minimum(sb, last), 0)

    def s_index(b, sb, start_ref, layer_ref):
        last = (start_ref[b] + T - 1) // bs
        return (layer_ref[0], b, 0, jnp.minimum(sb, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S // bs),
        in_specs=[
            pl.BlockSpec((1, T, Hk, G8, D),
                         lambda b, sb, start, layer: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hk, bs, D), kv_index),
            pl.BlockSpec((1, 1, Hk, bs, D), kv_index),
            pl.BlockSpec((1, 1, Hk, bs), s_index),
            pl.BlockSpec((1, 1, Hk, bs), s_index),
        ],
        out_specs=pl.BlockSpec((1, T, Hk, G8, D),
                               lambda b, sb, start, layer: (b, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * TG, D), jnp.float32),
            pltpu.VMEM((Hk * TG, 1), jnp.float32),
            pltpu.VMEM((Hk * TG, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_chunk_kernel_q8, block_s=bs, scale=scale,
                               n_kv=Hk, G8=G8, T=T)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hk, G8, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * TG * S * D,
            bytes_accessed=2 * B * Hk * S * D,
            transcendentals=B * Hk * TG * S,
        ),
    )(start, layer, qg, k_cache, v_cache, k_scale, v_scale)


def chunk_attention_supported(head_dim: int, T: int, num_heads: int,
                              num_kv_heads: int, max_seq: int) -> bool:
    g = num_heads // num_kv_heads
    # VMEM: the f32 acc scratch is Hk*T*8 rows x D, and the per-head score
    # block [T*8, bs] plus its exp/p copies live alongside it — measured
    # ceiling ~2.3 MB of acc (T=128 at 7B shapes; T=256 hit 22 MB scoped)
    rows = num_kv_heads * T * 8
    return (head_dim % 128 == 0 and g <= 8 and max_seq % 256 == 0
            and T % 8 == 0 and rows * head_dim * 4 <= 2.3 * 1024 * 1024)


def chunk_attention_contiguous(
    q: jax.Array,          # [B, T, Hq, D] this chunk's (post-rope) queries
    k_cache: jax.Array,    # [L, B, Hk, S, D] (chunk's keys already written)
    v_cache: jax.Array,
    layer: jax.Array,      # scalar int32
    start,                 # scalar or [B]: each row's first absolute position
    scale: float | None = None,
) -> jax.Array:
    """Returns [B, T, Hq, D] attention over the cache prefix [0, start+T)
    with causal masking by absolute position.  ``start`` may be per-row
    (ragged rows — the speculative verify forward, where each sequence is
    at its own length)."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, T, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, G8 - G), (0, 0)))
    starts = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (B,))
    out = _chunk_attention(
        starts, jnp.asarray(layer, jnp.int32).reshape(1),
        qg.astype(k_cache.dtype), k_cache, v_cache, scale=scale)
    return out[:, :, :, :G, :].reshape(B, T, Hq, D).astype(q.dtype)


def chunk_attention_contiguous_q8(
    q: jax.Array,          # [B, T, Hq, D] this chunk's (post-rope) queries
    k_cache: jax.Array,    # [L, B, Hk, S, D] int8 (chunk's keys written)
    v_cache: jax.Array,
    k_scale: jax.Array,    # [L, B, Hk, S] f32 per-token-per-head scales
    v_scale: jax.Array,
    layer: jax.Array,
    start,
    scale: float | None = None,
) -> jax.Array:
    """INT8-KV continuation-chunk flash attention (the capacity-serving
    config's prefill path — it used to fall back to the XLA score-block
    attention this kernel exists to avoid)."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, T, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, G8 - G), (0, 0)))
    starts = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (B,))
    out = _chunk_attention_q8(
        starts, jnp.asarray(layer, jnp.int32).reshape(1),
        qg.astype(jnp.bfloat16), k_cache, v_cache, k_scale, v_scale,
        scale=scale)
    return out[:, :, :, :G, :].reshape(B, T, Hq, D).astype(q.dtype)


# ----------------------------------------------------------------------
# Paged variants: continuation-chunk flash attention straight off the
# page pool. The serving scheduler's prefill pieces (one prefill_chunk of
# a long admission per tick, engine/scheduler.py) previously read the
# cache prefix through kvcache.paged_read — an XLA gather materializing
# [B, Hk, max_pages*page, D] per layer per piece (admission was
# gather-bound after the append kernel landed: docs/ROADMAP #2). Here the
# block table feeds scalar-prefetched BlockSpec index maps, so Mosaic
# DMAs exactly the pages the prefix occupies, and the q rows are tiled
# (grid dim qt) so VMEM holds one [TQ*G8, D] f32 accumulator while T can
# be the full prefill chunk (256+).
#
# Reference lineage: the reference materializes every prefill score row
# in shared memory (layers/src/self_attension.cu:15,79); its paged KV is
# a pointer-chased UVM list (iengine.cu:73-109). This is the TPU-native
# fix for both at once.
# ----------------------------------------------------------------------


def _paged_chunk_kernel(start_ref, layer_ref, tables_ref, q_ref, k_ref,
                        v_ref, o_ref, acc_ref, m_ref, l_ref, *, page,
                        scale, n_kv, G8, TQ):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)
    tile_start = start_ref[b] + qt * TQ   # first absolute q position
    end = tile_start + TQ                 # keys valid in [0, end)
    TG = TQ * G8
    D = q_ref.shape[4]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb * page < end)
    def _():
        needs_mask = (sb + 1) * page > tile_start
        kpos = sb * page + jax.lax.broadcasted_iota(
            jnp.int32, (TG, page), dimension=1)
        qpos = tile_start + jax.lax.broadcasted_iota(
            jnp.int32, (TG, page), dimension=0) // G8
        hide = jnp.logical_and(needs_mask, kpos > qpos)
        for h in range(n_kv):
            q = q_ref[0, :, h].reshape(TG, D)
            k = k_ref[0, 0, h]                             # [page, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(hide, _NEG_INF, s)

            sl = slice(h * TG, (h + 1) * TG)
            m_prev = m_ref[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[sl] = m_new
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom                          # [Hk*TQ*G8, D]
        o_ref[0] = out.reshape(n_kv, TQ, G8, D).swapaxes(0, 1).astype(
            o_ref.dtype)


def _paged_chunk_kernel_q8(start_ref, layer_ref, tables_ref, q_ref, k_ref,
                           v_ref, ks_ref, vs_ref, o_ref, acc_ref, m_ref,
                           l_ref, *, page, scale, n_kv, G8, TQ):
    b = pl.program_id(0)
    qt = pl.program_id(1)
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)
    tile_start = start_ref[b] + qt * TQ
    end = tile_start + TQ
    TG = TQ * G8
    D = q_ref.shape[4]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb * page < end)
    def _():
        needs_mask = (sb + 1) * page > tile_start
        kpos = sb * page + jax.lax.broadcasted_iota(
            jnp.int32, (TG, page), dimension=1)
        qpos = tile_start + jax.lax.broadcasted_iota(
            jnp.int32, (TG, page), dimension=0) // G8
        hide = jnp.logical_and(needs_mask, kpos > qpos)
        for h in range(n_kv):
            q = q_ref[0, :, h].reshape(TG, D)              # bf16
            k = k_ref[0, 0, h]                             # [page, D] int8
            ks = ks_ref[0, 0, h]                           # [page] f32
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (ks[None, :] * scale)
            s = jnp.where(hide, _NEG_INF, s)

            sl = slice(h * TG, (h + 1) * TG)
            m_prev = m_ref[sl]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[sl] = m_new
            pb = (p * vs_ref[0, 0, h][None, :]).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                pb, v_ref[0, 0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom
        o_ref[0] = out.reshape(n_kv, TQ, G8, D).swapaxes(0, 1).astype(
            o_ref.dtype)


def _pick_tq(T: int) -> int:
    return T if T <= 128 else 128


@functools.partial(jax.jit, static_argnames=("scale", "page"))
def _paged_chunk(start, layer, tables, qg, k_pages, v_pages, *, scale,
                 page):
    B, T, Hk, G8, D = qg.shape
    TQ = _pick_tq(T)
    n_qt = T // TQ
    pages_max = tables.shape[1]

    def kv_index(b, qt, sb, start, layer, tables):
        # last page this q tile needs; repeats skip the DMA
        last = (start[b] + (qt + 1) * TQ - 1) // page
        return (layer[0], tables[b, jnp.minimum(sb, last)], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_qt, pages_max),
        in_specs=[
            pl.BlockSpec((1, TQ, Hk, G8, D),
                         lambda b, qt, sb, start, layer, tables:
                         (b, qt, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hk, page, D), kv_index),
            pl.BlockSpec((1, 1, Hk, page, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, TQ, Hk, G8, D),
                               lambda b, qt, sb, start, layer, tables:
                               (b, qt, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * TQ * G8, D), jnp.float32),
            pltpu.VMEM((Hk * TQ * G8, 1), jnp.float32),
            pltpu.VMEM((Hk * TQ * G8, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_chunk_kernel, page=page, scale=scale,
                               n_kv=Hk, G8=G8, TQ=TQ)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hk, G8, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(start, layer, tables, qg, k_pages, v_pages)


@functools.partial(jax.jit, static_argnames=("scale", "page"))
def _paged_chunk_q8(start, layer, tables, qg, k_pages, v_pages, k_scale,
                    v_scale, *, scale, page):
    B, T, Hk, G8, D = qg.shape
    TQ = _pick_tq(T)
    n_qt = T // TQ
    pages_max = tables.shape[1]

    def kv_index(b, qt, sb, start, layer, tables):
        last = (start[b] + (qt + 1) * TQ - 1) // page
        return (layer[0], tables[b, jnp.minimum(sb, last)], 0, 0, 0)

    def s_index(b, qt, sb, start, layer, tables):
        last = (start[b] + (qt + 1) * TQ - 1) // page
        return (layer[0], tables[b, jnp.minimum(sb, last)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_qt, pages_max),
        in_specs=[
            pl.BlockSpec((1, TQ, Hk, G8, D),
                         lambda b, qt, sb, start, layer, tables:
                         (b, qt, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hk, page, D), kv_index),
            pl.BlockSpec((1, 1, Hk, page, D), kv_index),
            pl.BlockSpec((1, 1, Hk, page), s_index),
            pl.BlockSpec((1, 1, Hk, page), s_index),
        ],
        out_specs=pl.BlockSpec((1, TQ, Hk, G8, D),
                               lambda b, qt, sb, start, layer, tables:
                               (b, qt, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * TQ * G8, D), jnp.float32),
            pltpu.VMEM((Hk * TQ * G8, 1), jnp.float32),
            pltpu.VMEM((Hk * TQ * G8, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_chunk_kernel_q8, page=page,
                               scale=scale, n_kv=Hk, G8=G8, TQ=TQ)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hk, G8, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(start, layer, tables, qg, k_pages, v_pages, k_scale, v_scale)


def paged_chunk_attention_supported(head_dim: int, T: int, num_heads: int,
                                    num_kv_heads: int,
                                    page_size: int) -> bool:
    g = num_heads // num_kv_heads
    TQ = _pick_tq(T)
    rows = num_kv_heads * TQ * 8
    return (head_dim % 128 == 0 and g <= 8 and page_size % 8 == 0
            and T % 8 == 0 and T % TQ == 0
            and rows * head_dim * 4 <= 2.3 * 1024 * 1024)


def paged_chunk_attention(
    q: jax.Array,             # [B, T, Hq, D] this piece's (post-rope) queries
    k_pages: jax.Array,       # [L, P, Hk, page, D] (piece's keys written)
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    layer: jax.Array,         # scalar int32
    start,                    # scalar or [B]: first absolute position
    page_size: int,
    scale: float | None = None,
) -> jax.Array:
    """[B, T, Hq, D] attention over the paged prefix [0, start+T), causal
    by absolute position. The piece's own K/V must already be appended to
    the pages (ops/kv_append.paged_append_prefill)."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, T, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, G8 - G), (0, 0)))
    starts = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (B,))
    out = _paged_chunk(
        starts, jnp.asarray(layer, jnp.int32).reshape(1),
        block_tables.astype(jnp.int32), qg.astype(k_pages.dtype),
        k_pages, v_pages, scale=float(scale), page=page_size)
    return out[:, :, :, :G, :].reshape(B, T, Hq, D).astype(q.dtype)


def paged_chunk_attention_q8(
    q: jax.Array,             # [B, T, Hq, D]
    k_pages: jax.Array,       # [L, P, Hk, page, D] int8
    v_pages: jax.Array,
    k_scale: jax.Array,       # [L, P, Hk, page] f32
    v_scale: jax.Array,
    block_tables: jax.Array,
    layer: jax.Array,
    start,
    page_size: int,
    scale: float | None = None,
) -> jax.Array:
    """INT8-KV paged continuation-piece flash attention."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    G = Hq // Hk
    G8 = 8
    if scale is None:
        scale = D ** -0.5
    qg = q.reshape(B, T, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, G8 - G), (0, 0)))
    starts = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (B,))
    out = _paged_chunk_q8(
        starts, jnp.asarray(layer, jnp.int32).reshape(1),
        block_tables.astype(jnp.int32), qg.astype(jnp.bfloat16),
        k_pages, v_pages, k_scale, v_scale, scale=float(scale),
        page=page_size)
    return out[:, :, :, :G, :].reshape(B, T, Hq, D).astype(q.dtype)
