"""Token sampling: greedy / temperature / top-k / top-p + repetition penalty.

TPU-native replacement for the reference's single-block top-k sampling
kernel (reference: layers/src/logit_decode.cu:149-274 — k iterative masked
argmax passes over the 151936-wide logit row, temperature scale, softmax
over the k survivors, curand inverse-CDF draw).  Here ``jax.lax.top_k``
does the selection in one fused pass and ``jax.random.categorical`` draws
the sample; determinism-per-step mirrors the reference's
``curand_init(seed, subsequence=step)`` (logit_decode.cu:255-260) via
``jax.random.fold_in(key, step)``.

Also implements the repetition penalty the reference *declares but never
defines* (``apply_repetition_penalty_kernel``,
layers/include/layers_include.cuh:33) using HF-CTRL semantics over a
presence mask of previously seen tokens.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["temperature", "top_p", "repetition_penalty",
                 "presence_penalty"],
    meta_fields=["top_k", "greedy", "approx_top_k"],
)
@dataclasses.dataclass
class SamplingParams:
    """Per-request sampling configuration.

    Reference defaults: prefill temp 1.0 / decode temp 0.7, top_k 50
    (layers/src/qwen_main.cu:241,381-388).

    approx_top_k: use ``jax.lax.approx_max_k`` (TPU-native bucketed top-k,
    ~95% recall) instead of the exact sort-based ``jax.lax.top_k``.  Exact
    top-k over a 152k vocab costs ~3.5 ms at batch 128 — more than every
    non-matmul op in the decode step combined; the approximate variant is
    the intended serving configuration (tests use exact).
    """

    # temperature/top_p/repetition_penalty are data fields and may be
    # PER-ROW [B] arrays (continuous batching:each slot its own request
    # params); top_k/greedy/approx are static per compiled step
    temperature: float = 0.7
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    # OpenAI-style additive presence penalty: logits of already-seen
    # tokens are reduced by this amount (0 = off; typical range 0..2)
    presence_penalty: float = 0.0
    top_k: int = 50
    greedy: bool = False
    approx_top_k: bool = False


def apply_repetition_penalty(
    logits: jax.Array, seen_mask: jax.Array, penalty
) -> jax.Array:
    """HF-style repetition penalty: seen tokens' logits are divided by
    ``penalty`` when positive, multiplied when negative.

    logits: [B, V] fp32; seen_mask: [B, V] bool; penalty: scalar or [B].
    """
    penalty = jnp.asarray(penalty, dtype=logits.dtype)
    penalty = jnp.broadcast_to(penalty, logits.shape[:1])[:, None]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def sample(
    logits: jax.Array,
    key: jax.Array,
    params: SamplingParams,
    seen_mask: jax.Array | None = None,
) -> jax.Array:
    """Draw one token per row. logits: [B, V] (any float dtype) -> [B] int32."""
    logits = logits.astype(jnp.float32)
    if seen_mask is not None:
        logits = apply_repetition_penalty(logits, seen_mask, params.repetition_penalty)
        # presence_penalty may be a traced scalar: apply unconditionally
        # (subtracting 0 is free)
        pp = jnp.broadcast_to(
            jnp.asarray(params.presence_penalty, jnp.float32),
            logits.shape[:1])
        logits = logits - jnp.where(seen_mask, pp[:, None], 0.0)

    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(jnp.asarray(params.temperature, jnp.float32), 1e-6)
    temp = jnp.broadcast_to(temp, logits.shape[:1])[:, None]
    logits = logits / temp

    if params.top_k and params.top_k > 0:
        k = min(params.top_k, logits.shape[-1])
        if params.approx_top_k and k < logits.shape[-1]:
            top_vals, top_idx = jax.lax.approx_max_k(logits, k)
        else:
            top_vals, top_idx = jax.lax.top_k(logits, k)  # [B, k] descending
        top_vals = _mask_top_p(top_vals, params.top_p)
        choice = jax.random.categorical(key, top_vals, axis=-1)  # [B]
        return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    # no top-k: sample the full vocab (top_p over full sorted vocab)
    if params.top_p < 1.0:
        v = logits.shape[-1]
        top_vals, top_idx = jax.lax.top_k(logits, v)
        top_vals = _mask_top_p(top_vals, params.top_p)
        choice = jax.random.categorical(key, top_vals, axis=-1)
        return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _mask_top_p(sorted_logits: jax.Array, top_p) -> jax.Array:
    """Mask (to -inf) the tail of descending-sorted logits beyond cumulative
    probability ``top_p`` (scalar or per-row [B]). Top-1 always kept."""
    top_p = jnp.asarray(top_p, jnp.float32)
    top_p = jnp.broadcast_to(top_p, sorted_logits.shape[:-1])[..., None]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose *preceding* cumulative mass is < top_p
    keep = (cum - probs) < top_p
    keep = keep.at[..., 0].set(True)
    return jnp.where(keep, sorted_logits, -jnp.inf)


def sample_rows(
    logits: jax.Array,
    key: jax.Array,
    *,
    k_cap: int,
    temperature: jax.Array,          # [B] f32
    top_p: jax.Array,                # [B] f32
    top_k: jax.Array,                # [B] int32 (0 or >k_cap → k_cap)
    greedy: jax.Array,               # [B] bool
    repetition_penalty: jax.Array,   # [B] f32
    presence_penalty: jax.Array | None = None,   # [B] f32 additive
    seen_mask: jax.Array | None = None,
    approx_top_k: bool = False,
) -> jax.Array:
    """Per-row fully-dynamic sampling: every parameter is a [B] array, so
    one compiled step serves requests with different top_k/greedy/temp/
    top_p/penalty (continuous batching — the fix for per-request sampling
    being silently reduced to engine-level statics).  ``k_cap`` is the one
    static: the top-k selection width; per-row ``top_k`` masks within it.
    Greedy rows take the exact argmax (computed on the raw penalized
    logits, so approx_top_k's ~95% recall never affects greedy output).
    """
    logits = logits.astype(jnp.float32)
    if seen_mask is not None:
        logits = apply_repetition_penalty(logits, seen_mask, repetition_penalty)
        if presence_penalty is not None:
            logits = logits - jnp.where(seen_mask,
                                        presence_penalty[:, None], 0.0)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    k_cap = min(k_cap, logits.shape[-1])
    if approx_top_k and k_cap < logits.shape[-1]:
        top_vals, top_idx = jax.lax.approx_max_k(scaled, k_cap)
    else:
        top_vals, top_idx = jax.lax.top_k(scaled, k_cap)
    k_row = jnp.where((top_k <= 0) | (top_k > k_cap), k_cap, top_k)
    lane = jnp.arange(k_cap)[None, :]
    top_vals = jnp.where(lane < k_row[:, None], top_vals, -jnp.inf)
    top_vals = _mask_top_p(top_vals, top_p)
    choice = jax.random.categorical(key, top_vals, axis=-1)
    drawn = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    return jnp.where(greedy, arg, drawn).astype(jnp.int32)


def update_seen_mask(seen_mask: jax.Array, tokens: jax.Array) -> jax.Array:
    """Mark ``tokens`` [B] as seen in the [B, V] presence mask."""
    b = jnp.arange(seen_mask.shape[0])
    return seen_mask.at[b, tokens].set(True)


def seen_mask_from_prompts(
    prompt_ids: jax.Array, prompt_lens: jax.Array, vocab_size: int
) -> jax.Array:
    """Presence mask of prompt tokens (padded positions excluded)."""
    B, T = prompt_ids.shape
    valid = jnp.arange(T)[None, :] < prompt_lens[:, None]
    onehot = jax.nn.one_hot(prompt_ids, vocab_size, dtype=jnp.bool_)
    return jnp.any(onehot & valid[:, :, None], axis=1)
