"""GQA attention over a KV cache — XLA reference path.

TPU-native replacement for the reference's fused single-sequence attention
kernel (reference: layers/src/self_attension.cu:10-149): one CUDA block per
Q head, a serial softmax on thread 0, and a per-key-token walk of the paged
linked list.  Here the whole batched GQA attention is a pair of einsums with
an fp32 online-stable softmax — XLA fuses mask+softmax into the score matmul
and tiles both contractions onto the MXU.  GQA ratio and layer count come
from config shapes, never hardcoded (the reference bakes ``head_id =
blockIdx.x / 5`` and ``num_layers = 40`` into the kernel,
self_attension.cu:33-35).

A Pallas flash/ragged-paged kernel (ops/flash_attention.py,
ops/paged_attention.py) replaces this path where profitable; this module is
the semantics oracle both are tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_positions: jax.Array,
    kv_valid_len: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Token-major oracle wrapper: k/v ``[B, S, Hk, D]``.

    The decode path stores the cache head-major and calls
    :func:`gqa_attention_kmajor` directly (no transpose); this wrapper is
    the semantics oracle for tests and the fresh-prefill fallback.
    """
    return gqa_attention_kmajor(q, k.swapaxes(1, 2), v.swapaxes(1, 2),
                                q_positions, kv_valid_len, scale)


def gqa_attention_kmajor(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_positions: jax.Array,
    kv_valid_len: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Causal GQA attention of queries against a (padded) head-major cache.

    q: [B, T, Hq, D]   queries (already RoPE'd / qk-normed)
    k, v: [B, Hk, S, D] keys/values at absolute slots 0..S-1 (head-major —
        the einsum batch dims are (b, hk), so this is the layout the MXU
        consumes directly; token-major input forces a full-cache transpose)
    q_positions: [B, T] absolute position of each query token
    kv_valid_len: [B] optional number of valid KV slots (defaults to the
        causal bound; needed only if cache slots beyond a query's position
        could hold stale data — with position-ordered writes they cannot).

    Returns [B, T, Hq, D] in q.dtype.
    """
    B, T, Hq, D = q.shape
    Hk, S = k.shape[1], k.shape[2]
    G = Hq // Hk
    if scale is None:
        scale = D ** -0.5

    # Keep QK^T operands in their native (bf16) dtype: the MXU multiplies
    # bf16 mantissas exactly and accumulates in f32, so pre-casting to f32
    # is bit-identical but runs the matmul at a fraction of the MXU rate
    # and doubles HBM traffic.  Scale is applied to the f32 scores.
    qg = q.reshape(B, T, Hk, G, D)

    # scores: [B, Hk, G, T, S]
    scores = jnp.einsum("btkgd,bksd->bkgts", qg, k,
                        preferred_element_type=jnp.float32) * scale

    key_pos = jnp.arange(S, dtype=jnp.int32)
    mask = key_pos[None, None, :] <= q_positions[:, :, None]  # [B, T, S]
    if kv_valid_len is not None:
        mask &= key_pos[None, None, :] < kv_valid_len[:, None, None]
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG_INF)

    # stable softmax; fully-masked rows (padded queries) produce uniform junk
    # that is never read downstream.
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jnp.einsum("bkgts,bksd->btkgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D).astype(q.dtype)
