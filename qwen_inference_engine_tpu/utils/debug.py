"""Debug dump hooks: the reference's printf-debugging toolkit, done in JAX.

The reference inspects activations with per-layer device->host dumps
(``dump_device_bf16``, reference: layers/src/qwen_main.cu:43-61, called at
qwen_main.cu:85-128), top-k logit prints (``dump_top_logits``,
layers/src/logit_decode.cu:276-289) and KV-cache row dumps to a file
(``log_cache_host_range``, layers/src/include_cuda.cu:11-49). These are
the JAX equivalents: they work inside jit via ``jax.debug`` (printed at
execution time, not trace time) and are no-ops unless enabled, so they can
stay in the code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False


def enable(on: bool = True) -> None:
    """Globally enable/disable dump hooks (checked at trace time)."""
    global _ENABLED
    _ENABLED = on


def dump_activation(tag: str, x: jax.Array, n: int = 10) -> jax.Array:
    """Print the first ``n`` values (flattened) and summary stats of ``x``.

    Identity pass-through, jit-safe. ≙ dump_device_bf16's "first 10 values
    per layer" prints (qwen_main.cu:43-61).
    """
    if not _ENABLED:
        return x
    flat = x.reshape(-1)[:n].astype(jnp.float32)
    # tag rides as a parameter, not spliced into the format string — a
    # caller tag containing '{'/'}' must not break the formatter
    jax.debug.print(
        "{t}: head={h} mean={m:.6f} absmax={a:.6f}",
        t=tag, h=flat, m=jnp.mean(x.astype(jnp.float32)),
        a=jnp.max(jnp.abs(x.astype(jnp.float32))),
    )
    return x


def dump_top_logits(tag: str, logits: jax.Array, k: int = 5) -> jax.Array:
    """Print the top-k (value, id) pairs per row. ≙ logit_decode.cu:276-289."""
    if not _ENABLED:
        return logits
    vals, idx = jax.lax.top_k(logits.astype(jnp.float32), k)
    jax.debug.print("{t}: top{k} ids={i} vals={v}", t=tag, k=k, i=idx, v=vals)
    return logits


def dump_kv_rows(tag: str, cache_layer: jax.Array, batch: int, head: int,
                 start: int, count: int) -> jax.Array:
    """Print KV rows [start, start+count) of (batch, head) from a head-major
    [B, Hk, S, D] layer slice. ≙ log_cache_host_range
    (include_cuda.cu:11-49), without leaving the device."""
    if not _ENABLED:
        return cache_layer
    rows = jax.lax.dynamic_slice_in_dim(
        cache_layer[batch, head], start, count, axis=0)
    jax.debug.print("{t}: kv[{b},{h},{s}:{e}] firstdims={r}",
                    t=tag, b=batch, h=head, s=start, e=start + count,
                    r=rows[:, :4].astype(jnp.float32))
    return cache_layer
