"""KV caches: contiguous per-slot and paged (block-table) variants.

TPU-native replacement for the reference's KV machinery:

* the reference's singly linked list of UVM pages, pointer-chased per key
  token inside the attention kernel (reference: layers/src/iengine.cu:73-109,
  layers/src/self_attension.cu:47-60) becomes a **preallocated page pool
  array** ``[L, num_pages, page_size, Hk, D]`` addressed through an int32
  block table — static shapes, scatter/gather instead of pointer chasing;
* its host-side ``cudaMemcpy2D`` prefill fill and per-token decode appends
  (layers/src/include_cuda.cu:165-279) become in-jit
  ``dynamic_update_slice`` / scatter writes — zero host round-trips;
* page co-location of all layers per token (include_cuda.cu:264-265) is
  deliberately NOT kept: on TPU the layer axis is the ``lax.scan`` axis and
  per-layer page slabs give contiguous lane-aligned reads.

The contiguous cache ``[L, B, S, Hk, D]`` is the fast path for fixed-batch
decode (baseline configs 1-2); the paged cache enables continuous batching
and long contexts (configs 3-4). Layer slices (leading ``L`` axis) are
scanned over inside the jitted step, so all functions here operate on a
single layer's slice.

Optional INT8 KV quantization (per-token-per-head scales) lives in
quant/kv_quant.py and wraps these writes/reads.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """Contiguous cache: k/v ``[L, B, Hk, S, D]`` (head-major).

    Head-major so the decode attention einsums (batch dims ``b, hk``,
    contraction ``d``/``s``) consume the cache in its stored layout — with
    token-major ``[B, S, Hk, D]`` XLA inserted a full-cache transpose per
    layer per step (~10 ms at 7B batch 128, measured by ablation).

    k_scale/v_scale: ``[L, B, Hk, S]`` fp32 per-token-per-head scales when
    the cache dtype is int8, else None.
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(
        num_layers: int,
        batch: int,
        max_seq: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        # round the sequence capacity up to the flash decode kernel's
        # block size (ops/decode_attention.py); padded slots are masked by
        # position everywhere and never DMA'd (clamped block index map).
        max_seq = -(-max_seq // 256) * 256
        shape = (num_layers, batch, num_kv_heads, max_seq, head_dim)
        quant = dtype == jnp.int8
        return KVCache(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            k_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
            v_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k_pages", "v_pages", "k_scale", "v_scale"],
    meta_fields=["page_size"],
)
@dataclasses.dataclass
class PagedKVCache:
    """Paged cache: k/v pages ``[L, num_pages, Hk, page_size, D]``.

    Head-major within a page so the Pallas paged-attention kernel's block
    is a lane-aligned ``[page_size, D]`` tile per (page, head).  Block
    tables (``[slots, max_pages_per_seq]`` int32 page ids) and sequence
    lengths are scheduler state (engine/scheduler.py), not stored here —
    pages are a global pool shared by all sequences, the TPU equivalent of
    the reference's page free list.
    """

    k_pages: jax.Array
    v_pages: jax.Array
    k_scale: Optional[jax.Array]  # [L, num_pages, Hk, page_size] fp32
    v_scale: Optional[jax.Array]
    page_size: int

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @staticmethod
    def create(
        num_layers: int,
        num_pages: int,
        page_size: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "PagedKVCache":
        shape = (num_layers, num_pages, num_kv_heads, page_size, head_dim)
        quant = dtype == jnp.int8
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype=dtype),
            v_pages=jnp.zeros(shape, dtype=dtype),
            k_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
            v_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
            page_size=page_size,
        )


# ----------------------------------------------------------------------
# Contiguous cache ops (single-layer slices: [B, S, Hk, D])
# ----------------------------------------------------------------------

def contiguous_write(
    cache_l: jax.Array,
    new: jax.Array,
    positions: jax.Array,
    fresh_prefill: bool = False,
) -> jax.Array:
    """Write ``new [B, T, Hk, D]`` at ``positions [B, T]`` into the
    head-major ``[B, Hk, S, D]`` layer cache.

    ``fresh_prefill=True`` asserts positions are ``0..T-1`` for every row and
    lowers to a single dynamic_update_slice (the fast path, analogous to the
    reference's one cudaMemcpy2D per layer at prefill).
    """
    new_km = new.astype(cache_l.dtype).swapaxes(1, 2)  # [B, Hk, T, ...]
    if fresh_prefill:
        starts = (0,) * cache_l.ndim
        return jax.lax.dynamic_update_slice(cache_l, new_km, starts)
    b = jnp.arange(cache_l.shape[0])[:, None]
    return cache_l.at[b, :, positions].set(new.astype(cache_l.dtype))


def contiguous_read(cache_l: jax.Array) -> jax.Array:
    return cache_l


# ----------------------------------------------------------------------
# Paged cache ops (single-layer slices: [P, page, Hk, D])
# ----------------------------------------------------------------------

def paged_write(
    pages_l: jax.Array,
    new: jax.Array,
    positions: jax.Array,
    block_tables: jax.Array,
    page_size: int,
) -> jax.Array:
    """Scatter ``new [B, T, Hk, D]`` at absolute ``positions [B, T]`` through
    ``block_tables [B, max_pages]`` into the page pool ``[P, Hk, page, D]``.

    Replaces the reference's per-token page-list walk + 2 cudaMemcpys
    (include_cuda.cu:233-279). Page *allocation* (growing a sequence's block
    table) is host-side scheduler logic; here tables are already sized.
    """
    logical_page = positions // page_size  # [B, T]
    slot = positions % page_size
    page_ids = jnp.take_along_axis(block_tables, logical_page, axis=1)  # [B, T]
    # advanced indices (page_ids, slot) around the head slice broadcast to
    # [B, T] and land in front: result dims [B, T, Hk, ...] match `new`.
    return pages_l.at[page_ids, :, slot].set(new.astype(pages_l.dtype))


def paged_read(
    pages_l: jax.Array, block_tables: jax.Array
) -> jax.Array:
    """Gather a head-major view ``[B, Hk, max_pages*page_size, D]``.

    XLA fallback used by the jnp attention path; the Pallas ragged paged
    attention kernel consumes pages directly and skips this materialization.
    """
    gathered = pages_l[block_tables]  # [B, max_pages, Hk, page, ...]
    B, NP, Hk, PS = gathered.shape[:4]
    rest = gathered.shape[4:]
    return gathered.swapaxes(1, 2).reshape(B, Hk, NP * PS, *rest)



def kv_dtype_from_bits(bits: int):
    """KV cache dtype for a --kv-bits style flag: 8 -> int8 (quantized
    pool with scale slabs), 32 -> float32 (CPU serving/tests), anything
    else -> bfloat16."""
    import jax.numpy as jnp

    return {8: jnp.int8, 32: jnp.float32}.get(bits, jnp.bfloat16)

def pages_required(seq_len: int, page_size: int) -> int:
    """ceil(seq/page) — the reference eager-allocates one extra
    (iengine.cu:339-351); we allocate exactly and grow lazily."""
    return -(-seq_len // page_size)


# ----------------------------------------------------------------------
# Stacked (whole-cache) writes at a layer index — used by the scan-carry
# cache in models/qwen.py. Writing through the full [L, ...] carry lets
# XLA update the (donated) cache buffer in place; returning per-layer
# slices as scan ys would stack them into freshly allocated buffers,
# copying the entire cache every step.
# ----------------------------------------------------------------------

def contiguous_write_stacked(
    cache: jax.Array,          # [L, B, Hk, S, D] (or [L, B, Hk, S, 1] scales)
    layer: jax.Array,          # scalar int32
    new: jax.Array,            # [B, T, Hk, ...] (token-major, as computed)
    positions: jax.Array,      # [B, T]
    fresh_prefill: bool = False,
) -> jax.Array:
    if fresh_prefill:
        starts = (layer,) + (0,) * (cache.ndim - 1)
        new_km = new.swapaxes(1, 2)  # [B, Hk, T, ...]
        return jax.lax.dynamic_update_slice(
            cache, new_km[None].astype(cache.dtype), starts)
    b = jnp.arange(cache.shape[1])[:, None]
    return cache.at[layer, b, :, positions].set(new.astype(cache.dtype))


def paged_write_stacked(
    pages: jax.Array,          # [L, P, Hk, page, D] (or [L, P, Hk, page])
    layer: jax.Array,
    new: jax.Array,            # [B, T, Hk, ...]
    positions: jax.Array,      # [B, T] absolute
    block_tables: jax.Array,   # [B, max_pages]
    page_size: int,
) -> jax.Array:
    logical_page = positions // page_size
    slot = positions % page_size
    page_ids = jnp.take_along_axis(block_tables, logical_page, axis=1)
    return pages.at[layer, page_ids, :, slot].set(new.astype(pages.dtype))
