"""Pallas ragged paged attention for decode (T=1 per sequence).

TPU-native replacement for the reference's decode attention: where that
kernel pointer-chases a UVM linked list per key token
(reference: layers/src/self_attension.cu:47-60,120-132), here the block
table is a **scalar-prefetched** int32 array — the page id feeds the
BlockSpec index map, so Mosaic's pipeline DMAs exactly the pages a
sequence owns, ragged lengths and all, with no gather materialization
(the XLA fallback in kvcache.paged_read) and no pointer walks.

Two entry points:

* ``paged_decode_attention`` — one layer's page pool ``[P, Hk, page, D]``
  (oracle-matching, used by tests and non-scan callers);
* ``paged_decode_attention_stacked`` — the STACKED pool
  ``[L, P, Hk, page, D]`` with the layer index in scalar prefetch. Inside
  the model's layer scan this avoids the per-layer dynamic-slice of the
  whole pool (a full copy per layer per step, same pathology the
  contiguous cache had — see ops/decode_attention.py).

Grid is (B, max_pages) with ALL KV heads of a sequence processed per cell
(static head loop) — per-grid-cell fixed overhead (~0.4 us) dominates
decode kernels, so cells must carry as much work as possible. Pages past
a sequence's length are never fetched: the index map clamps to the last
valid page and Mosaic skips the DMA when the block index repeats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pages_per_cell(page_size: int, pages_max: int,
                    page_block_bytes: int) -> int:
    """Pages fetched (as separate scalar-prefetched block refs) per grid
    cell. Measured on the r4 chip: a grid cell costs ~4 us END TO END
    almost regardless of its payload (page 128 one-page cells: 1.1 us;
    ppc=4 cells: 4.6 us; the contiguous kernel's 2048-token cells:
    3.7 us) — so tokens-per-cell is the whole game. Target the
    contiguous kernel's 2048 tokens, capped by per-ref VMEM (~2 MB of
    single-buffered K blocks) and a 16-ref pragmatic bound."""
    by_vmem = max(1, (2 << 20) // max(1, page_block_bytes))
    return int(max(1, min(16, max(1, 2048 // page_size), by_vmem,
                          pages_max)))


def _paged_kernel(tables_ref, lens_ref, layer_ref, q_ref, *rest, scale,
                  page_size, n_kv, n_t=1, ppc=1):
    """n_t == 1: plain decode (one query per sequence). n_t > 1: the
    speculative VERIFY step — each sequence scores n_t consecutive query
    tokens (its last accepted token + the drafts) in one pass, so the qk/pv
    dots run at M = n_t*G8 instead of 8, filling MXU M-passes that plain
    decode wastes 15/16 of (docs/PERF.md). Query row r is token
    t = r // G8 at absolute position seq_len - n_t + t; causality within
    the fresh window is the per-row mask k_pos < seq_len - (n_t-1-t).

    ppc pages arrive per cell as separate block refs (the pool appears
    ppc times in in_specs with index maps pt*ppc+i) — grid cells and
    their fixed overhead shrink ppc-fold."""
    k_refs = rest[:ppc]
    v_refs = rest[ppc:2 * ppc]
    o_ref, acc_ref, m_ref, l_ref = rest[2 * ppc:]
    b = pl.program_id(0)
    pt = pl.program_id(1)
    n_pt = pl.num_programs(1)
    GP = q_ref.shape[2]

    @pl.when(pt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]

    for c in range(ppc):
        base = (pt * ppc + c) * page_size

        @pl.when(base < seq_len)
        def _(c=c, base=base):
            k_pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (GP, page_size), 1)
            if n_t == 1:
                valid = k_pos < seq_len
            else:
                q_t = jax.lax.broadcasted_iota(
                    jnp.int32, (GP, page_size), 0) // (GP // n_t)
                valid = k_pos < seq_len - (n_t - 1) + q_t
            for h in range(n_kv):  # all KV heads of a sequence per cell
                q = q_ref[0, h]                            # [GP, D]
                k = k_refs[c][0, 0, h]                     # [page, D]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(valid, s, _NEG_INF)

                sl = slice(h * GP, (h + 1) * GP)
                m_prev = m_ref[sl]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[sl] = (l_ref[sl] * alpha
                             + jnp.sum(p, axis=1, keepdims=True))
                m_ref[sl] = m_new
                pv = jax.lax.dot_general(
                    p.astype(v_refs[c].dtype), v_refs[c][0, 0, h],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(pt == n_pt - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "page_size", "n_t"))
def _paged_bhgd(q, k_pages, v_pages, tables, lens, layer, *, scale,
                page_size, n_t=1):
    """q [B, Hk, GP, D]; pools stacked [L, P, Hk, page, D]."""
    B, Hk, GP, D = q.shape
    pages_max = tables.shape[1]
    ppc = _pages_per_cell(page_size, pages_max,
                          Hk * page_size * D * k_pages.dtype.itemsize)

    def kv_index(i):
        def f(b, pt, tables, lens, layer):
            # clamp to the last page this row needs (repeat idx => no DMA)
            last = jnp.maximum(lens[b] - 1, 0) // page_size
            return (layer[0], tables[b, jnp.minimum(pt * ppc + i, last)],
                    0, 0, 0)
        return f

    kernel = functools.partial(
        _paged_kernel, scale=scale, page_size=page_size, n_kv=Hk, n_t=n_t,
        ppc=ppc)
    page_spec = lambda i: pl.BlockSpec((1, 1, Hk, page_size, D),
                                       kv_index(i),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, -(-pages_max // ppc)),
        in_specs=[
            pl.BlockSpec((1, Hk, GP, D),
                         lambda b, pt, tables, lens, layer: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [page_spec(i) for i in range(ppc)]
          + [page_spec(i) for i in range(ppc)],
        out_specs=pl.BlockSpec((1, Hk, GP, D),
                               lambda b, pt, tables, lens, layer: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hk * GP, D), jnp.float32),
            pltpu.VMEM((Hk * GP, 1), jnp.float32),
            pltpu.VMEM((Hk * GP, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, GP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tables, lens, layer, q, *([k_pages] * ppc), *([v_pages] * ppc))


def paged_attention_supported(head_dim: int, page_size: int) -> bool:
    return head_dim % 128 == 0 and page_size % 8 == 0 and page_size >= 8


def _prep_q(q, Hk):
    B, T, Hq, D = q.shape
    assert T == 1, "paged decode attention is a decode (T=1) kernel"
    G = Hq // Hk
    GP = max(8, G)
    qh = q[:, 0].reshape(B, Hk, G, D)
    if GP != G:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, GP - G), (0, 0)))
    return qh, G


def paged_decode_attention_stacked(
    q: jax.Array,           # [B, 1, Hq, D] (decode step)
    k_pages: jax.Array,     # [L, P, Hk, page, D] stacked page pool
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    seq_lens: jax.Array,      # [B] int32 — number of VALID kv tokens
    page_size: int,
    layer,                    # scalar int32
    scale: float | None = None,
) -> jax.Array:
    """Decode-step GQA attention straight off the stacked page pool."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    G = Hq // Hk
    if scale is None:
        scale = D ** -0.5
    qh, G = _prep_q(q, Hk)
    out = _paged_bhgd(qh, k_pages, v_pages,
                      block_tables.astype(jnp.int32),
                      seq_lens.astype(jnp.int32),
                      jnp.asarray(layer, jnp.int32).reshape(1),
                      scale=float(scale), page_size=page_size)
    return out[:, :, :G, :].reshape(B, 1, Hq, D)


def paged_decode_attention(
    q: jax.Array,           # [B, 1, Hq, D] (decode step)
    k_pages: jax.Array,     # [P, Hk, page, D] (one layer's slice)
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    seq_lens: jax.Array,      # [B] int32
    page_size: int,
    scale: float | None = None,
) -> jax.Array:
    """Single-layer wrapper (oracle-matching; tests and non-scan callers).

    Semantics match gqa_attention over paged_read with positions=len-1.
    Returns [B, 1, Hq, D].
    """
    return paged_decode_attention_stacked(
        q, k_pages[None], v_pages[None], block_tables, seq_lens, page_size,
        0, scale=scale)

# ----------------------------------------------------------------------
# INT8-KV variant: K/V pages stay int8 through mixed-input MXU dots;
# per-token scales ([L, P, Hk, page] f32) multiply the f32 score rows (K)
# and fold into the probabilities before the PV dot (V) — same recipe as
# the contiguous q8 kernel (ops/decode_attention.py). Continuous batching
# with INT8 KV doubles the page-pool capacity at equal HBM.
# ----------------------------------------------------------------------

def _paged_kernel_q8(tables_ref, lens_ref, layer_ref, q_ref, *rest,
                     scale, page_size, n_kv, n_t=1, ppc=1):
    k_refs = rest[:ppc]
    v_refs = rest[ppc:2 * ppc]
    ks_refs = rest[2 * ppc:3 * ppc]
    vs_refs = rest[3 * ppc:4 * ppc]
    o_ref, acc_ref, m_ref, l_ref = rest[4 * ppc:]
    b = pl.program_id(0)
    pt = pl.program_id(1)
    n_pt = pl.num_programs(1)
    GP = q_ref.shape[2]

    @pl.when(pt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]

    for c in range(ppc):
        base = (pt * ppc + c) * page_size

        @pl.when(base < seq_len)
        def _(c=c, base=base):
            k_pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (GP, page_size), 1)
            if n_t == 1:
                valid = k_pos < seq_len
            else:  # verify: per-query-token causal mask (_paged_kernel)
                q_t = jax.lax.broadcasted_iota(
                    jnp.int32, (GP, page_size), 0) // (GP // n_t)
                valid = k_pos < seq_len - (n_t - 1) + q_t
            for h in range(n_kv):
                q = q_ref[0, h]                            # [GP, D] bf16
                k = k_refs[c][0, 0, h]                     # [page, D] int8
                ks = ks_refs[c][0, 0, h]                   # [page] f32
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * (ks[None, :] * scale)              # dequant K
                s = jnp.where(valid, s, _NEG_INF)

                sl = slice(h * GP, (h + 1) * GP)
                m_prev = m_ref[sl]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[sl] = (l_ref[sl] * alpha
                             + jnp.sum(p, axis=1, keepdims=True))
                m_ref[sl] = m_new
                pv = jax.lax.dot_general(
                    (p * vs_refs[c][0, 0, h][None, :]).astype(jnp.bfloat16),
                    v_refs[c][0, 0, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(pt == n_pt - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "page_size", "n_t"))
def _paged_bhgd_q8(q, k_pages, v_pages, k_scale, v_scale, tables, lens,
                   layer, *, scale, page_size, n_t=1):
    B, Hk, GP, D = q.shape
    pages_max = tables.shape[1]
    ppc = _pages_per_cell(page_size, pages_max,
                          Hk * page_size * D * k_pages.dtype.itemsize)

    def kv_index(i):
        def f(b, pt, tables, lens, layer):
            last = jnp.maximum(lens[b] - 1, 0) // page_size
            return (layer[0], tables[b, jnp.minimum(pt * ppc + i, last)],
                    0, 0, 0)
        return f

    def sc_index(i):
        def f(b, pt, tables, lens, layer):
            last = jnp.maximum(lens[b] - 1, 0) // page_size
            return (layer[0], tables[b, jnp.minimum(pt * ppc + i, last)],
                    0, 0)
        return f

    kernel = functools.partial(
        _paged_kernel_q8, scale=scale, page_size=page_size, n_kv=Hk,
        n_t=n_t, ppc=ppc)
    page_spec = lambda i: pl.BlockSpec((1, 1, Hk, page_size, D),
                                       kv_index(i),
                                       memory_space=pltpu.VMEM)
    scale_spec = lambda i: pl.BlockSpec((1, 1, Hk, page_size), sc_index(i),
                                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, -(-pages_max // ppc)),
        in_specs=[
            pl.BlockSpec((1, Hk, GP, D),
                         lambda b, pt, tables, lens, layer: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [page_spec(i) for i in range(ppc)]
          + [page_spec(i) for i in range(ppc)]
          + [scale_spec(i) for i in range(ppc)]
          + [scale_spec(i) for i in range(ppc)],
        out_specs=pl.BlockSpec((1, Hk, GP, D),
                               lambda b, pt, tables, lens, layer: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hk * GP, D), jnp.float32),
            pltpu.VMEM((Hk * GP, 1), jnp.float32),
            pltpu.VMEM((Hk * GP, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, GP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tables, lens, layer, q, *([k_pages] * ppc), *([v_pages] * ppc),
      *([k_scale] * ppc), *([v_scale] * ppc))


def paged_decode_attention_stacked_q8(
    q: jax.Array,           # [B, 1, Hq, D]
    k_pages: jax.Array,     # [L, P, Hk, page, D] int8
    v_pages: jax.Array,
    k_scale: jax.Array,     # [L, P, Hk, page] f32
    v_scale: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    page_size: int,
    layer,
    scale: float | None = None,
) -> jax.Array:
    """INT8-KV decode attention off the stacked page pool."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    if scale is None:
        scale = D ** -0.5
    qh, G = _prep_q(q, Hk)
    out = _paged_bhgd_q8(qh.astype(jnp.bfloat16), k_pages, v_pages,
                         k_scale, v_scale,
                         block_tables.astype(jnp.int32),
                         seq_lens.astype(jnp.int32),
                         jnp.asarray(layer, jnp.int32).reshape(1),
                         scale=float(scale), page_size=page_size)
    return out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ----------------------------------------------------------------------
# Multi-query (speculative VERIFY) attention off the page pool: each
# sequence scores T = spec_k+1 consecutive fresh tokens (last accepted +
# drafts) in one pass. Same grid/pipeline as decode, but the qk/pv dots
# run at M = T*8 instead of 8 — the M-fill that plain decode can't get
# (docs/PERF.md: decode wastes 15/16 of each 128-row MXU pass), and the
# KV stream is read ONCE per T scored tokens. The reference scores one
# token per call (layers/src/qwen_main.cu:250-404).
# ----------------------------------------------------------------------

_G8 = 8  # per-token query-row group (pad G up; sublane granule)


def paged_verify_attention_supported(head_dim: int, page_size: int,
                                     n_t: int, num_heads: int,
                                     num_kv_heads: int) -> bool:
    G = num_heads // num_kv_heads
    return (paged_attention_supported(head_dim, page_size)
            and 2 <= n_t <= 16 and G <= _G8)


def _prep_q_multi(q, Hk):
    """[B, T, Hq, D] -> [B, Hk, T*G8, D] (query rows grouped per token)."""
    B, T, Hq, D = q.shape
    G = Hq // Hk
    qh = q.reshape(B, T, Hk, G, D)
    if G != _G8:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, _G8 - G), (0, 0)))
    return qh.transpose(0, 2, 1, 3, 4).reshape(B, Hk, T * _G8, D), G


def _unprep_o(out, B, T, Hk, G, D):
    out = out.reshape(B, Hk, T, _G8, D).transpose(0, 2, 1, 3, 4)
    return out[:, :, :, :G, :].reshape(B, T, Hk * G, D)


def paged_verify_attention_stacked(
    q: jax.Array,             # [B, T, Hq, D] — T consecutive fresh tokens
    k_pages: jax.Array,       # [L, P, Hk, page, D] stacked page pool
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    seq_lens: jax.Array,      # [B] int32 — valid kv INCLUDING the T fresh
    page_size: int,
    layer,
    scale: float | None = None,
) -> jax.Array:
    """Causal GQA attention for T fresh tokens per row over the page pool.

    Row b's token t sits at absolute position ``seq_lens[b] - T + t`` and
    attends keys [0, that position]. The fresh K/V must already be written
    to the pages (ops/kv_append.paged_append_ragged_t). Returns
    [B, T, Hq, D]."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    if scale is None:
        scale = D ** -0.5
    qh, G = _prep_q_multi(q, Hk)
    out = _paged_bhgd(qh.astype(k_pages.dtype), k_pages, v_pages,
                      block_tables.astype(jnp.int32),
                      seq_lens.astype(jnp.int32),
                      jnp.asarray(layer, jnp.int32).reshape(1),
                      scale=float(scale), page_size=page_size, n_t=T)
    return _unprep_o(out, B, T, Hk, G, D).astype(q.dtype)


def paged_verify_attention_stacked_q8(
    q: jax.Array,             # [B, T, Hq, D]
    k_pages: jax.Array,       # [L, P, Hk, page, D] int8
    v_pages: jax.Array,
    k_scale: jax.Array,       # [L, P, Hk, page] f32
    v_scale: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    page_size: int,
    layer,
    scale: float | None = None,
) -> jax.Array:
    """INT8-KV variant of paged_verify_attention_stacked."""
    B, T, Hq, D = q.shape
    Hk = k_pages.shape[2]
    if scale is None:
        scale = D ** -0.5
    qh, G = _prep_q_multi(q, Hk)
    out = _paged_bhgd_q8(qh.astype(jnp.bfloat16), k_pages, v_pages,
                         k_scale, v_scale,
                         block_tables.astype(jnp.int32),
                         seq_lens.astype(jnp.int32),
                         jnp.asarray(layer, jnp.int32).reshape(1),
                         scale=float(scale), page_size=page_size, n_t=T)
    return _unprep_o(out, B, T, Hk, G, D).astype(q.dtype)

