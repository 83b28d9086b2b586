"""RMSNorm and per-head QK-norm.

TPU-native replacement for the reference's serial one-thread-per-token
RMSNorm kernel (reference: layers/src/normalization.cu:5-26) and the
per-head qk-norm kernel (layers/src/qk_norm.cu:43-80).  On TPU these are
bandwidth-trivial VPU ops that XLA fuses into neighboring matmuls, so they
are expressed as plain jnp — a Pallas kernel would only add launch overhead.

NOTE the reference hardcodes eps=1e-4 (normalization.cu:9, qk_norm.cu:46),
diverging from Qwen's configured 1e-6; we take eps from ModelConfig
(SURVEY.md "fidelity traps").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Row-wise RMS normalization with learned scale.

    Matches HF Qwen2RMSNorm semantics: variance in fp32, normalized value is
    cast back to the input dtype *before* the weight multiply.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(dtype)
    return normed * weight.astype(dtype)


def qk_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Per-head RMSNorm over head_dim (Qwen3's q_norm/k_norm).

    x: [..., heads, head_dim]; weight: [head_dim].
    """
    return rms_norm(x, weight, eps)
