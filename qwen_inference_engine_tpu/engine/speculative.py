"""Prompt-lookup speculative decoding (no draft model).

Each iteration drafts ``k`` tokens by copying what followed the most
recent earlier occurrence of the current ``ngram``-token suffix in the
sequence's own history (prompt + generated — the "prompt lookup" draft,
strong on extraction/summarization/code where output echoes input), then
verifies all drafts in ONE forward of T=k+1 tokens. Verification keeps
the longest prefix of drafts equal to the model's own token chain —
argmax for greedy, or a per-position categorical draw for stochastic
sampling (with a DETERMINISTIC draft, emitting the sampled token at the
first mismatch is distribution-exact: every emitted token is drawn from
the model's distribution at its position). Output is therefore identical
to token-by-token decoding under the same rng discipline; every
iteration emits between 1 and k+1 tokens for one forward pass.

Everything (draft matching, verification, acceptance, output scatter)
runs inside one jitted step; the host polls completion every few
iterations just like the plain engine loop. KV entries written for
rejected drafts are overwritten by later steps before they can be
attended (writes precede reads at every position in the forward).

The reference engine has nothing comparable (strictly one token per
``llm()`` call, qwen_main.cu:250-404).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.models.qwen import compute_logits, forward_hidden


def pld_draft(history: jax.Array, lens: jax.Array, *, ngram: int,
              k: int) -> Tuple[jax.Array, jax.Array]:
    """Draft ``k`` tokens per row from the row's own history.

    history [B, S] (positions ≥ lens are don't-care); lens [B] = number of
    valid tokens. Returns (drafts [B, k] int32, valid [B] bool). A row
    with no earlier ngram match gets valid=False (caller still verifies —
    the first verified token is always accepted, so correctness holds).
    """
    B, S = history.shape
    pos = jnp.arange(S)[None, :]                     # [1, S]
    # suffix = last `ngram` valid tokens of each row
    suf_idx = lens[:, None] - ngram + jnp.arange(ngram)[None, :]
    suffix = jnp.take_along_axis(history, jnp.maximum(suf_idx, 0), axis=1)
    # windows starting at j match iff history[j:j+n] == suffix and the
    # window (plus k continuation tokens) lies strictly before the suffix
    eq = jnp.ones((B, S), bool)
    for t in range(ngram):
        shifted = jnp.roll(history, -t, axis=1)
        eq = eq & (shifted == suffix[:, t : t + 1])
    ok = eq & (pos + ngram <= lens[:, None] - ngram) & (pos + ngram + k <= S)
    j = jnp.argmax(jnp.where(ok, pos, -1), axis=1)   # LAST such window
    found = jnp.any(ok, axis=1)
    gather = j[:, None] + ngram + jnp.arange(k)[None, :]
    drafts = jnp.take_along_axis(history, jnp.minimum(gather, S - 1), axis=1)
    return drafts.astype(jnp.int32), found


@functools.partial(jax.jit, static_argnames=("cfg", "k", "ngram",
                                             "use_pallas", "greedy",
                                             "temperature"),
                   donate_argnums=(4,))
def speculative_step(
    params: dict,
    cfg: ModelConfig,
    history: jax.Array,    # [B, S] prompt+generated so far (device)
    lens: jax.Array,       # [B] valid history length (= next position)
    cache,
    done: jax.Array,       # [B] bool
    rng: jax.Array = None,
    *,
    k: int,
    ngram: int,
    use_pallas: bool = True,
    greedy: bool = True,
    temperature: float = 0.7,
):
    """One speculation round. Returns (history', lens', cache, done',
    n_new [B]) where n_new tokens were appended per row (0 if done)."""
    B, S = history.shape
    eos = jnp.asarray(list(cfg.eos_token_ids), jnp.int32)

    drafts, _ = pld_draft(history, lens, ngram=ngram, k=k)
    last = jnp.take_along_axis(history, lens[:, None] - 1, axis=1)  # [B,1]
    tokens = jnp.concatenate([last, drafts], axis=1)    # [B, k+1]
    positions = lens[:, None] - 1 + jnp.arange(k + 1)[None, :]

    hidden, cache = forward_hidden(
        params, cfg, tokens, positions, cache,
        fresh_prefill=False, use_pallas=use_pallas)
    logits = compute_logits(params, hidden, use_pallas)  # [B, k+1, V]
    if greedy:
        chain = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        # one categorical draw per position (keys folded per position so
        # the chain matches token-by-token sampling discipline)
        t = jnp.maximum(temperature, 1e-6)
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(k + 1))

        def draw(key, lg):
            return jax.random.categorical(key, lg / t, axis=-1)

        chain = jax.vmap(draw, in_axes=(0, 1), out_axes=1)(
            keys, logits.astype(jnp.float32)).astype(jnp.int32)

    # accept drafts while draft[i] == chain[i-1]; then append chain[a]
    match = drafts == chain[:, :-1]                      # [B, k]
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
    a = jnp.sum(acc, axis=1)                             # accepted drafts
    # emitted tokens this round: greedy[0..a] (a+1 of them)
    emit = jnp.where(jnp.arange(k + 1)[None, :] <= a[:, None],
                     chain, 0)
    # stop at the first EOS inside the emitted run
    is_eos = jnp.any(emit[:, :, None] == eos[None, None, :], axis=-1) & \
        (jnp.arange(k + 1)[None, :] <= a[:, None])
    first_eos = jnp.where(jnp.any(is_eos, axis=1),
                          jnp.argmax(is_eos, axis=1), k + 1)
    n_new = jnp.where(done, 0, jnp.minimum(a + 1, first_eos + 1))

    # scatter the emitted tokens into the history at [lens, lens+n_new)
    tgt = lens[:, None] + jnp.arange(k + 1)[None, :]
    keep = jnp.arange(k + 1)[None, :] < n_new[:, None]
    row = jnp.arange(B)[:, None]
    history = history.at[row, jnp.where(keep, tgt, S - 1)].set(
        jnp.where(keep, emit, history[:, S - 1 : S]))
    lens = lens + n_new
    done = done | jnp.any(is_eos, axis=1)
    return history, lens, cache, done, n_new


def generate_speculative(
    params: dict,
    cfg: ModelConfig,
    prompts,               # list[list[int]]
    cache,
    max_new_tokens: int = 128,
    *,
    k: int = 8,
    ngram: int = 3,
    use_pallas: bool = True,
):
    """Greedy generation with prompt-lookup speculation.

    Output is token-identical to plain greedy decoding; throughput gain is
    the mean accepted run length (1x worst case, up to (k+1)x on
    echo-heavy continuations). Returns list of generated id lists.
    """
    import numpy as np

    from qwen_inference_engine_tpu.models.qwen import prefill

    B = len(prompts)
    max_len = max(len(p) for p in prompts)
    S = cache.k.shape[3]
    assert max_len + max_new_tokens + k + 1 <= S, "cache too small"
    hist = np.zeros((B, S), np.int32)
    lens0 = np.zeros((B,), np.int32)
    for i, p in enumerate(prompts):
        hist[i, : len(p)] = p
        lens0[i] = len(p)
    history = jnp.asarray(hist)
    lens = jnp.asarray(lens0)

    logits, cache = prefill(params, cfg, history[:, :max_len], lens, cache,
                            use_pallas=use_pallas)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    history = history.at[jnp.arange(B), lens].set(first)
    prompt_lens = lens
    lens = lens + 1
    eos_np = np.asarray(list(cfg.eos_token_ids))
    done = jnp.asarray(np.isin(np.asarray(first), eos_np))

    budget = lens + (max_new_tokens - 1)
    it = 0
    while True:
        history, lens, cache, done, n_new = speculative_step(
            params, cfg, history, lens, cache, done, k=k, ngram=ngram,
            use_pallas=use_pallas)
        lens = jnp.minimum(lens, budget)
        it += 1
        if it % 4 == 0 or it >= max_new_tokens:
            done_np = np.asarray(done | (lens >= budget))
            if done_np.all() or it >= max_new_tokens:
                break

    hist_np = np.asarray(history)
    lens_np = np.asarray(lens)
    outs = []
    for i in range(B):
        row = hist_np[i, int(prompt_lens[i]) : int(lens_np[i])].tolist()
        clipped = []
        for t in row:
            clipped.append(int(t))
            if t in cfg.eos_token_ids:
                break
        outs.append(clipped)
    return outs
