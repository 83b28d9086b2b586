"""Pallas ragged paged attention for decode (T=1 per sequence).

TPU-native replacement for the reference's decode attention: where that
kernel pointer-chases a UVM linked list per key token
(reference: layers/src/self_attension.cu:47-60,120-132), here the block
table is a **scalar-prefetched** int32 array — the page id feeds the
BlockSpec index map, so Mosaic's pipeline DMAs exactly the pages a
sequence owns, ragged lengths and all, with no gather materialization
(the XLA fallback in kvcache.paged_read) and no pointer walks.

Grid: (B, Hk, max_pages), pages innermost with online softmax across
pages.  All G = Hq/Hk query heads of a KV head are processed together as
one [G, D] tile (GQA mapping by index arithmetic — the reference hardcodes
``head_id = blockIdx.x / 5``, self_attension.cu:33).  Pages past a
sequence's length are skipped via pl.when on the prefetched length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _paged_kernel(tables_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, scale, page_size, pages_max):
    b = pl.program_id(0)
    pt = pl.program_id(2)

    @pl.when(pt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]

    @pl.when(pt * page_size < seq_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale        # [GP, D]
        k = k_ref[0, 0].astype(jnp.float32)                # [page, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [GP, page]
        k_pos = pt * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < seq_len, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        v = v_ref[0, 0].astype(jnp.float32)                # [page, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(pt == pages_max - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "page_size"))
def _paged_bhgd(q, k_pages, v_pages, tables, lens, *, scale, page_size):
    B, Hk, GP, D = q.shape
    pages_max = tables.shape[1]
    kernel = functools.partial(
        _paged_kernel, scale=scale, page_size=page_size, pages_max=pages_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hk, pages_max),
        in_specs=[
            pl.BlockSpec((1, 1, GP, D),
                         lambda b, kh, pt, tables, lens: (b, kh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page_size, D),
                         lambda b, kh, pt, tables, lens: (tables[b, pt], kh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page_size, D),
                         lambda b, kh, pt, tables, lens: (tables[b, pt], kh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, GP, D),
                               lambda b, kh, pt, tables, lens: (b, kh, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((GP, D), jnp.float32),
            pltpu.VMEM((GP, 128), jnp.float32),
            pltpu.VMEM((GP, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, GP, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(tables, lens, q, k_pages, v_pages)


def paged_attention_supported(head_dim: int, page_size: int) -> bool:
    return head_dim % 128 == 0 and page_size % 8 == 0 and page_size >= 8


def paged_decode_attention(
    q: jax.Array,           # [B, 1, Hq, D] (decode step)
    k_pages: jax.Array,     # [P, Hk, page, D] (one layer's slice)
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    seq_lens: jax.Array,      # [B] int32 — number of VALID kv tokens
    page_size: int,
    scale: float | None = None,
) -> jax.Array:
    """Decode-step GQA attention straight off the page pool.

    Semantics match gqa_attention over paged_read with positions=len-1
    (the test oracle). Returns [B, 1, Hq, D].
    """
    B, T, Hq, D = q.shape
    assert T == 1, "paged_decode_attention is a decode (T=1) kernel"
    Hk = k_pages.shape[1]
    G = Hq // Hk
    GP = max(8, G)
    if scale is None:
        scale = D ** -0.5
    qh = q[:, 0].reshape(B, Hk, G, D)
    if GP != G:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, GP - G), (0, 0)))
    out = _paged_bhgd(qh, k_pages, v_pages,
                      block_tables.astype(jnp.int32),
                      seq_lens.astype(jnp.int32),
                      scale=float(scale), page_size=page_size)
    out = out[:, :, :G, :].reshape(B, 1, Hq, D)
    return out
