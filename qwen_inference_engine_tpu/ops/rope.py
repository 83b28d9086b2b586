"""Rotary position embeddings (rotate-half / NeoX convention).

TPU-native replacement for the reference RoPE kernel
(reference: layers/src/RoPE.cu:6-22 + table precompute
layers/src/include.cpp:5-18, decode single-position variant
layers/include/helpers.cuh:143-147).

IMPORTANT divergence from the reference, kept deliberately: the reference
rotates *adjacent pairs* (GPT-J interleaved, RoPE.cu:12-19) which does NOT
match HuggingFace Qwen checkpoints; real Qwen2/2.5/3 use rotate-half
(NeoX).  We implement rotate-half so real checkpoints produce correct
logits (SURVEY.md "fidelity traps").

Tables are precomputed once per engine ([max_pos, head_dim] fp32, the
analogue of the reference's cos/sin tables in ModelBuffers,
layers/src/utills.cu:36-44) and gathered by absolute position inside the
jitted step — both prefill (a [B, T] position matrix) and decode (positions
[B, 1]) use the same gather; no special single-position relaunch is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def precompute_rope(
    max_position: int, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape [max_position, head_dim] (fp32).

    Frequencies ``theta^(-2i/d)`` duplicated across both halves, matching HF
    ``emb = cat(freqs, freqs)``.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    pos = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # [S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, d]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jax.Array, positions: jax.Array, cos_table: jax.Array, sin_table: jax.Array
) -> jax.Array:
    """Rotate q or k by absolute position.

    x: [B, T, heads, head_dim]; positions: [B, T] int32.
    Rotation in fp32, result cast back to x.dtype.
    """
    cos = cos_table[positions][:, :, None, :]  # [B, T, 1, d]
    sin = sin_table[positions][:, :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
