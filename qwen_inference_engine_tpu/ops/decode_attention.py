"""Flash decode attention over the STACKED contiguous KV cache.

The decode hot path keeps the whole [L, B, Hk, S, D] cache as a scan carry
(models/qwen.py). Slicing layer ``l`` out with a dynamic-slice materializes
a full copy of the layer's KV before the attention einsum can read it —
measured ~10 ms/step at 7B batch 128 (ablation in scripts/ablate_decode.py).
This kernel instead reads the layer's KV blocks straight out of the stacked
HBM array: the layer index rides in scalar-prefetch and the BlockSpec index
map addresses ``(layer, b, s_block)`` directly, so Mosaic's pipeline DMAs
exactly the bytes attention needs, double-buffered, with zero staging copy.

Grid-cell economics dominate at decode (each cell's dots are tiny), so the
grid is (B, S_blocks) with ALL KV heads of a row processed in one cell
(static head loop) and S blocked coarsely (up to 2048 tokens per block) —
a (B, Hk, S/256) grid measured ~14 ms/step of pure cell overhead at 7B
batch 80, S 1280. Blocks past a row's valid length are never fetched: the
block index map clamps to the last valid block and Mosaic skips the DMA
when the index repeats.

Online-softmax (flash) accumulation over S blocks; GQA query heads of a
group ride in the sublane dim. The INT8-KV variant keeps K/V int8 through
mixed-input MXU dots: per-token scales multiply the f32 score rows (K) and
fold into the probabilities before the PV dot (V).

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


def _flash_update(s, v, vs, h, G8, acc_ref, m_ref, l_ref):
    """One online-softmax block update for head-group h.

    s: [G8, BS] masked f32 scores; v: [BS, D] (bf16 or int8);
    vs: [BS] f32 V dequant scales or None.
    """
    sl = slice(h * G8, (h + 1) * G8)
    m_prev = m_ref[sl]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if vs is not None:
        p = p * vs[None, :]
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[sl] = acc_ref[sl] * alpha + pv
    m_ref[sl] = m_new




def _flash_block_batched(s_all, vget, n_groups, G8, acc_ref, m_ref, l_ref):
    """One online-softmax update for a whole cell's stacked scores.

    s_all: [n_groups*G8, BS] f32 (already masked where needed);
    vget(g) -> [BS, D] value block for group g. All state ops are WIDE
    (the per-group form spent ~2 us/cell in narrow [G8,1] chains).
    """
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s_all, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    pr = jnp.exp(s_all - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=1, keepdims=True)
    m_ref[:] = m_new
    pb = pr.astype(jnp.bfloat16)
    acc_ref[:] = acc_ref[:] * alpha
    for g in range(n_groups):
        sl = slice(g * G8, (g + 1) * G8)
        acc_ref[sl] = acc_ref[sl] + jax.lax.dot_general(
            pb[sl], vget(g), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _decode_kernel(lens_ref, layer_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, m_ref, l_ref, s_all, *, block_s, scale, n_kv,
                   rpc):
    bb = pl.program_id(0)      # batch-row block (rpc rows per cell)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    G8 = q_ref.shape[2]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # any row of the cell still has tokens in this block?
    maxlen = jnp.int32(0)
    minlen = jnp.int32(2 ** 30)
    for r in range(rpc):
        maxlen = jnp.maximum(maxlen, lens_ref[bb * rpc + r])
        minlen = jnp.minimum(minlen, lens_ref[bb * rpc + r])

    @pl.when(sb * block_s < maxlen)
    def _():
        for r in range(rpc):
            for h in range(n_kv):  # all KV heads of the cell's rows
                q = q_ref[r, h]                # [G8, D] bf16
                k = k_ref[0, r, h]             # [BS, D]
                sc = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                sl = slice((r * n_kv + h) * G8, (r * n_kv + h + 1) * G8)
                s_all[sl] = sc

        @pl.when((sb + 1) * block_s > minlen)
        def _():
            # edge block only: mask positions at/after each row's length
            kpos = sb * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (G8, block_s), dimension=1)
            for r in range(rpc):
                valid = kpos < lens_ref[bb * rpc + r]
                for h in range(n_kv):
                    sl = slice((r * n_kv + h) * G8,
                               (r * n_kv + h + 1) * G8)
                    s_all[sl] = jnp.where(valid, s_all[sl], _NEG_INF)

        _flash_block_batched(
            s_all[:], lambda g: v_ref[0, g // n_kv, g % n_kv],
            rpc * n_kv, G8, acc_ref, m_ref, l_ref)

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[:] = (acc_ref[:] / denom).reshape(o_ref.shape).astype(o_ref.dtype)


def _decode_kernel_q8(lens_ref, layer_ref, q_ref, k_ref, v_ref, ks_ref,
                      vs_ref, o_ref, acc_ref, m_ref, l_ref, s_all, *,
                      block_s, scale, n_kv):
    b = pl.program_id(0)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    G8 = q_ref.shape[2]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = lens_ref[b]

    @pl.when(sb * block_s < length)
    def _():
        for h in range(n_kv):
            q = q_ref[0, h]                    # [G8, D] bf16
            k = k_ref[0, 0, h]                 # [BS, D] int8
            ks = ks_ref[0, 0, h]               # [BS] f32
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_all[h * G8:(h + 1) * G8] = sc * (ks[None, :] * scale)

        @pl.when((sb + 1) * block_s > length)
        def _():
            kpos = sb * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (n_kv * G8, block_s), dimension=1)
            s_all[:] = jnp.where(kpos < length, s_all[:], _NEG_INF)

        # batched wide-VPU state update; V dequant scales fold into the
        # probabilities before the PV dots
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s_all[:], axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(s_all[:] - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha
        for h in range(n_kv):
            sl = slice(h * G8, (h + 1) * G8)
            pb = (pr[sl] * vs_ref[0, 0, h][None, :]).astype(jnp.bfloat16)
            acc_ref[sl] = acc_ref[sl] + jax.lax.dot_general(
                pb, v_ref[0, 0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def decode_attention_supported(head_dim: int, max_seq: int, num_heads: int,
                               num_kv_heads: int) -> bool:
    g = num_heads // num_kv_heads
    return head_dim % 128 == 0 and g <= 8 and max_seq % 256 == 0


def _pick_block_s(s: int) -> int:
    """Largest divisor of S up to a cap (128-multiple): big blocks amortize
    the per-grid-cell overhead; the clamped index map bounds over-fetch at
    the ragged edge to one block. QIE_ATTN_BLOCK_S overrides the cap (perf
    sweeps)."""
    import os

    cap = int(os.environ.get("QIE_ATTN_BLOCK_S", "2048"))
    best = 0
    for d in range(1, s // 128 + 1):
        bs = 128 * d
        if s % bs == 0 and bs <= cap:
            best = bs
    return best


def _specs(G8, D, bs, n_kv, quant, rpc=1):
    # layer_ref holds [layer, row0]: row0 shifts the cache batch window
    # (pipeline decode attends one microbatch's rows of the full stacked
    # cache per tick without slice copies; row0 % rpc == 0 by contract)
    def kv_index(bb, sb, lens_ref, layer_ref):
        # clamp to the last block this row-block needs: Mosaic skips the
        # DMA when the block index repeats, so blocks past the valid length
        # are fetched zero times (their compute is skipped via pl.when).
        last = jnp.int32(0)
        for r in range(rpc):
            last = jnp.maximum(last, lens_ref[bb * rpc + r] - 1)
        return (layer_ref[0], bb + layer_ref[1] // rpc, 0,
                jnp.minimum(sb, jnp.maximum(last, 0) // bs), 0)

    def s_index(bb, sb, lens_ref, layer_ref):
        last = jnp.int32(0)
        for r in range(rpc):
            last = jnp.maximum(last, lens_ref[bb * rpc + r] - 1)
        return (layer_ref[0], bb + layer_ref[1] // rpc, 0,
                jnp.minimum(sb, jnp.maximum(last, 0) // bs))

    in_specs = [
        pl.BlockSpec((rpc, n_kv, G8, D), lambda bb, sb, lens, layer: (bb, 0, 0, 0)),
        pl.BlockSpec((1, rpc, n_kv, bs, D), kv_index),
        pl.BlockSpec((1, rpc, n_kv, bs, D), kv_index),
    ]
    if quant:
        in_specs += [
            pl.BlockSpec((1, rpc, n_kv, bs), s_index),
            pl.BlockSpec((1, rpc, n_kv, bs), s_index),
        ]
    out_spec = pl.BlockSpec((rpc, n_kv, G8, D),
                            lambda bb, sb, lens, layer: (bb, 0, 0, 0))
    return in_specs, out_spec


def _scratch(n_kv, G8, D):
    return [
        pltpu.VMEM((n_kv * G8, D), jnp.float32),
        pltpu.VMEM((n_kv * G8, 1), jnp.float32),
        pltpu.VMEM((n_kv * G8, 1), jnp.float32),
    ]


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention(lens, layer, q8, k_cache, v_cache, *, scale):
    """``layer`` is [layer_idx, row0] int32 (row0: cache batch offset)."""
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    # rows per cell: halves the per-grid-cell fixed cost; VMEM-capped
    rpc = 2 if (B % 2 == 0 and 2 * 2 * Hk * bs * D * k_cache.dtype.itemsize
                * 2 <= 13 * 1024 * 1024) else 1
    in_specs, out_spec = _specs(G8, D, bs, Hk, quant=False, rpc=rpc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // rpc, S // bs),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=_scratch(rpc * Hk, G8, D) + [
            pltpu.VMEM((rpc * Hk * G8, bs), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel, block_s=bs, scale=scale,
                               n_kv=Hk, rpc=rpc)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * D * k_cache.dtype.itemsize,
            transcendentals=B * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention_q8(lens, layer, q8, k_cache, v_cache, k_scale, v_scale,
                         *, scale):
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    in_specs, out_spec = _specs(G8, D, bs, Hk, quant=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S // bs),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=_scratch(Hk, G8, D) + [
            pltpu.VMEM((Hk * G8, bs), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel_q8, block_s=bs, scale=scale,
                               n_kv=Hk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * (D + 4),
            transcendentals=B * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache, k_scale, v_scale)


def _prep_q(q, Hk):
    B, T, Hq, D = q.shape
    assert T == 1, T
    G = Hq // Hk
    G8 = 8
    qg = q.reshape(B, Hk, G, D)
    if G < G8:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))
    return qg, G, G8


def decode_attention_contiguous(
    q: jax.Array,          # [B, 1, Hq, D] current-step queries
    k_cache: jax.Array,    # [L, Bc, Hk, S, D] stacked head-major cache
    v_cache: jax.Array,
    layer: jax.Array,      # scalar int32
    lengths: jax.Array,    # [B] valid kv length per row (position + 1)
    scale: float | None = None,
    row0=0,                # cache batch offset (PP decode row window;
                           # may be traced; row0 % 2 == 0 when B is even)
) -> jax.Array:
    """Returns [B, 1, Hq, D] in q.dtype."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    if scale is None:
        scale = D ** -0.5
    qg, G, G8 = _prep_q(q, Hk)
    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(row0, jnp.int32)])
    out = _decode_attention(lengths.astype(jnp.int32), meta,
                            qg, k_cache, v_cache, scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D)


def decode_attention_contiguous_q8(
    q: jax.Array,          # [B, 1, Hq, D]
    k_cache: jax.Array,    # [L, Bc, Hk, S, D] int8
    v_cache: jax.Array,
    k_scale: jax.Array,    # [L, Bc, Hk, S] f32
    v_scale: jax.Array,
    layer: jax.Array,
    lengths: jax.Array,    # [B]
    scale: float | None = None,
    row0=0,                # cache batch offset (PP decode row window)
) -> jax.Array:
    """INT8-KV flash decode over the stacked cache. Returns [B, 1, Hq, D]."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    if scale is None:
        scale = D ** -0.5
    qg, G, G8 = _prep_q(q, Hk)
    qg = qg.astype(jnp.bfloat16)
    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(row0, jnp.int32)])
    out = _decode_attention_q8(lengths.astype(jnp.int32), meta,
                               qg, k_cache, v_cache, k_scale, v_scale,
                               scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ----------------------------------------------------------------------
# Fresh-token merge: attend over the cache's OLD tokens (lengths exclude
# the current position) and fold the current step's K/V — which are live
# values in the layer body — into the flash state in-register. Attention
# then no longer depends on the KV append having happened, so all layers'
# appends can be deferred and batched into one kernel per step
# (ops/kv_append.py::kv_append_all_uniform).
# ----------------------------------------------------------------------

def _merge_fresh(q_ref, kn_ref, vn_ref, h, G8, scale, acc_ref, m_ref, l_ref):
    # elementwise forms throughout: Mosaic cannot reshape a bf16 vector's
    # minor dim, and at [G8, 1] x [1, D] sizes the VPU beats the MXU anyway
    q = q_ref[0, h].astype(jnp.float32)        # [G8, D]
    kn = kn_ref[0, h].astype(jnp.float32)      # [D]
    sl = slice(h * G8, (h + 1) * G8)
    s = jnp.sum(q * kn[None, :], axis=1, keepdims=True) * scale  # [G8, 1]
    m_prev = m_ref[sl]
    m_new = jnp.maximum(m_prev, s)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                     # [G8, 1]
    l_ref[sl] = l_ref[sl] * alpha + p
    pv = p * vn_ref[0, h].astype(jnp.float32)[None, :]           # [G8, D]
    acc_ref[sl] = acc_ref[sl] * alpha + pv
    m_ref[sl] = m_new


def _decode_kernel_fresh(lens_ref, layer_ref, q_ref, k_ref, v_ref, kn_ref,
                         vn_ref, o_ref, acc_ref, m_ref, l_ref, *, block_s,
                         scale, n_kv):
    b = pl.program_id(0)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    G8 = q_ref.shape[2]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = lens_ref[b]   # OLD tokens only (current position excluded)

    @pl.when(sb * block_s < length)
    def _():
        kpos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (G8, block_s), dimension=1)
        valid = kpos < length
        for h in range(n_kv):
            q = q_ref[0, h]
            s = jax.lax.dot_general(
                q, k_ref[0, 0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, _NEG_INF)
            _flash_update(s, v_ref[0, 0, h], None, h, G8,
                          acc_ref, m_ref, l_ref)

    @pl.when(sb == n_sb - 1)
    def _():
        for h in range(n_kv):
            _merge_fresh(q_ref, kn_ref, vn_ref, h, G8, scale,
                         acc_ref, m_ref, l_ref)
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention_fresh(lens, layer, q8, k_cache, v_cache, kn, vn, *,
                            scale):
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    in_specs, out_spec = _specs(G8, D, bs, Hk, quant=False)
    in_specs = in_specs + [
        pl.BlockSpec((1, Hk, D), lambda b, sb, lens, layer: (b, 0, 0)),
        pl.BlockSpec((1, Hk, D), lambda b, sb, lens, layer: (b, 0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S // bs),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=_scratch(Hk, G8, D),
    )
    kernel = functools.partial(_decode_kernel_fresh, block_s=bs, scale=scale,
                               n_kv=Hk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * D * k_cache.dtype.itemsize,
            transcendentals=B * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache, kn, vn)


def decode_attention_contiguous_fresh(
    q: jax.Array,          # [B, 1, Hq, D]
    k_cache: jax.Array,    # [L, B, Hk, S, D] (current token NOT yet written)
    v_cache: jax.Array,
    k_new: jax.Array,      # [B, 1, Hk, D] this step's (post-rope) K
    v_new: jax.Array,
    layer: jax.Array,
    old_lengths: jax.Array,  # [B] = current position (valid OLD kv tokens)
    scale: float | None = None,
) -> jax.Array:
    """Flash decode over old cache + in-register fresh-token merge."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    if scale is None:
        scale = D ** -0.5
    qg, G, G8 = _prep_q(q, Hk)
    dt = k_cache.dtype
    kn = k_new.reshape(B, Hk, D).astype(dt)
    vn = v_new.reshape(B, Hk, D).astype(dt)
    meta = jnp.stack([jnp.asarray(layer, jnp.int32), jnp.int32(0)])
    out = _decode_attention_fresh(old_lengths.astype(jnp.int32), meta,
                                  qg.astype(dt), k_cache, v_cache,
                                  kn, vn, scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)

# ----------------------------------------------------------------------
# Append-fused decode attention: the separate uniform KV append op costs
# ~1.6 ms/step at 7B b112 (tile RMW of every layer's band). Here the
# fresh token's K/V rows are instead BLENDED into the already-fetched KV
# block inside the attention kernel (the s-block containing ``pos``), used
# for this step's scores, and only the 8-row tile band is DMA'd back to
# the (aliased, in-place) HBM cache for future steps — the append rides
# the bytes attention was reading anyway.
# ----------------------------------------------------------------------

def _decode_append_kernel(pos_ref, layer_ref, q_ref, k_ref, v_ref, kn_ref,
                          vn_ref, o_ref, kc_out, vc_out, acc_ref, m_ref,
                          l_ref, s_all, kband, vband, sem, *, block_s, scale,
                          n_kv, rpc, n_rb):
    bb = pl.program_id(0)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    G8 = q_ref.shape[2]
    D = q_ref.shape[3]
    l = layer_ref[0]
    p = pos_ref[0]
    length = p + 1
    sb_p = p // block_s

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb == sb_p)
    def _():
        # blend the fresh rows into this block (in VMEM) and write the
        # 8-row tile band back to the cache through a small scratch (the
        # input block buffer is recycled by the pipeline, so the band DMA
        # must not source from it)
        t0 = pl.multiple_of(((p % block_s) // 8) * 8, 8)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (rpc, n_kv, 8, D), dimension=2)
        sel = row == (p % block_s - t0)
        kn = kn_ref[:]                        # [rpc, n_kv, D]
        vn = vn_ref[:]
        kb = jnp.where(sel, kn[:, :, None, :],
                       k_ref[0, :, :, pl.ds(t0, 8), :])
        vb = jnp.where(sel, vn[:, :, None, :],
                       v_ref[0, :, :, pl.ds(t0, 8), :])
        k_ref[0, :, :, pl.ds(t0, 8), :] = kb
        v_ref[0, :, :, pl.ds(t0, 8), :] = vb
        slot = bb % 2

        @pl.when(bb >= 2)
        def _():
            # the slot's previous band write must land before reuse
            pltpu.make_async_copy(kband.at[slot], kband.at[slot],
                                  sem.at[slot, 0]).wait()
            pltpu.make_async_copy(vband.at[slot], vband.at[slot],
                                  sem.at[slot, 1]).wait()

        kband[slot] = kb.astype(kband.dtype)
        vband[slot] = vb.astype(vband.dtype)
        t0g = pl.multiple_of((p // 8) * 8, 8)
        rows = pl.ds(bb * rpc + layer_ref[1], rpc)  # [1]: row0 (PP window)
        pltpu.make_async_copy(kband.at[slot],
                              kc_out.at[l, rows, :, pl.ds(t0g, 8), :],
                              sem.at[slot, 0]).start()
        pltpu.make_async_copy(vband.at[slot],
                              vc_out.at[l, rows, :, pl.ds(t0g, 8), :],
                              sem.at[slot, 1]).start()

    @pl.when(sb * block_s < length)
    def _():
        for r in range(rpc):
            for h in range(n_kv):
                q = q_ref[r, h]                # [G8, D]
                k = k_ref[0, r, h]             # [BS, D]
                sl = slice((r * n_kv + h) * G8, (r * n_kv + h + 1) * G8)
                s_all[sl] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale

        @pl.when((sb + 1) * block_s > length)
        def _():
            # edge block only (uniform decode: same length on every row)
            kpos = sb * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (rpc * n_kv * G8, block_s), dimension=1)
            s_all[:] = jnp.where(kpos < length, s_all[:], _NEG_INF)

        _flash_block_batched(
            s_all[:], lambda g: v_ref[0, g // n_kv, g % n_kv],
            rpc * n_kv, G8, acc_ref, m_ref, l_ref)

    @pl.when(sb == n_sb - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[:] = (acc_ref[:] / denom).reshape(o_ref.shape).astype(o_ref.dtype)

        @pl.when(bb == n_rb - 1)
        def _():
            # drain the last two band writes before the kernel retires
            for s_ in range(2):
                @pl.when(jnp.logical_or(bb % 2 == s_,
                                        jnp.logical_and(bb >= 1,
                                                        (bb - 1) % 2 == s_)))
                def _(s_=s_):
                    pltpu.make_async_copy(kband.at[s_], kband.at[s_],
                                          sem.at[s_, 0]).wait()
                    pltpu.make_async_copy(vband.at[s_], vband.at[s_],
                                          sem.at[s_, 1]).wait()


@functools.partial(jax.jit, static_argnames=("scale",))
def _decode_attention_append(pos, layer, q8, k_cache, v_cache, kn, vn, *,
                             scale):
    B, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    bs = _pick_block_s(S)
    rpc = 2 if (B % 2 == 0 and 2 * 2 * Hk * bs * D * k_cache.dtype.itemsize
                * 2 <= 13 * 1024 * 1024) else 1
    n_rb = B // rpc

    def kv_index(bb, sb, pos_ref, layer_ref):
        # clamp to the last valid block: repeated indices skip the DMA;
        # layer_ref[1] = row0 (cache batch window for PP decode)
        return (layer_ref[0], bb + layer_ref[1] // rpc, 0,
                jnp.minimum(sb, pos_ref[0] // bs), 0)

    in_specs = [
        pl.BlockSpec((rpc, Hk, G8, D), lambda bb, sb, pos, layer: (bb, 0, 0, 0)),
        pl.BlockSpec((1, rpc, Hk, bs, D), kv_index),
        pl.BlockSpec((1, rpc, Hk, bs, D), kv_index),
        pl.BlockSpec((rpc, Hk, D), lambda bb, sb, pos, layer: (bb, 0, 0)),
        pl.BlockSpec((rpc, Hk, D), lambda bb, sb, pos, layer: (bb, 0, 0)),
    ]
    out_specs = (
        pl.BlockSpec((rpc, Hk, G8, D), lambda bb, sb, pos, layer: (bb, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb, S // bs),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=_scratch(rpc * Hk, G8, D) + [
            pltpu.VMEM((rpc * Hk * G8, bs), jnp.float32),
            pltpu.VMEM((2, rpc, Hk, 8, D), k_cache.dtype),
            pltpu.VMEM((2, rpc, Hk, 8, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_decode_append_kernel, block_s=bs, scale=scale,
                               n_kv=Hk, rpc=rpc, n_rb=n_rb)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hk, G8, D), q8.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={3: 1, 4: 2},  # caches alias (scalars count)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hk * G8 * S * D,
            bytes_accessed=2 * B * Hk * S * D * k_cache.dtype.itemsize,
            transcendentals=B * Hk * G8 * S,
        ),
    )(pos, layer, q8, k_cache, v_cache, kn, vn)


def decode_attention_appending(
    q: jax.Array,          # [B, 1, Hq, D]
    k_cache: jax.Array,    # [L, B, Hk, S, D] (fresh token NOT yet written)
    v_cache: jax.Array,
    k_new: jax.Array,      # [B, 1, Hk, D] this step's post-rope K
    v_new: jax.Array,
    layer: jax.Array,
    position,              # scalar: the fresh token's position (uniform)
    scale: float | None = None,
    row0=0,                # cache batch offset (PP row window; traced ok)
):
    """Returns (attn [B, 1, Hq, D], k_cache', v_cache') with the fresh
    rows appended in place (aliased buffers)."""
    B, T, Hq, D = q.shape
    Hk = k_cache.shape[2]
    if scale is None:
        scale = D ** -0.5
    qg, G, G8 = _prep_q(q, Hk)
    kn = k_new.reshape(B, Hk, D).astype(k_cache.dtype)
    vn = v_new.reshape(B, Hk, D).astype(v_cache.dtype)
    pos = jnp.asarray(position, jnp.int32).reshape(1)
    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(row0, jnp.int32)])
    out, kc, vc = _decode_attention_append(
        pos, meta, qg.astype(k_cache.dtype),
        k_cache, v_cache, kn, vn, scale=scale)
    return out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype), kc, vc
