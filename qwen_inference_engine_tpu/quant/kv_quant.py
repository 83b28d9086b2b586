"""INT8 KV-cache quantization (per-token, per-head absmax scales).

The reference's KV cache is pure bf16; INT8 KV is a baseline requirement
(BASELINE.json configs 2-5): halves KV HBM traffic — the decode-attention
bottleneck — and doubles the max resident context/batch.

Scheme: symmetric absmax over each written key/value head vector
(``scale = max|x| / 127`` per [token, head]), chosen over per-page or
per-channel scales because appends are online (one token at a time at
decode) and RoPE'd key magnitudes drift with position, so token-local
scales track the distribution with no calibration pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., D] float -> (int8 [..., D], fp32 scale [...])."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(int8 [..., D], fp32 [...]) -> float [..., D]."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
