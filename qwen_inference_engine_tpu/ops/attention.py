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
    """Causal GQA attention of queries against a (padded) KV buffer.

    q: [B, T, Hq, D]   queries (already RoPE'd / qk-normed)
    k, v: [B, S, Hk, D] keys/values at absolute slots 0..S-1
    q_positions: [B, T] absolute position of each query token
    kv_valid_len: [B] optional number of valid KV slots (defaults to the
        causal bound; needed only if cache slots beyond a query's position
        could hold stale data — with position-ordered writes they cannot).

    Returns [B, T, Hq, D] in q.dtype.
    """
    B, T, Hq, D = q.shape
    S, Hk = k.shape[1], k.shape[2]
    G = Hq // Hk
    if scale is None:
        scale = D ** -0.5

    qf = q.reshape(B, T, Hk, G, D).astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: [B, Hk, G, T, S]
    scores = jnp.einsum("btkgd,bskd->bkgts", qf, kf, preferred_element_type=jnp.float32)

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

    out = jnp.einsum("bkgts,bskd->btkgd", probs, vf, preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D).astype(q.dtype)
