"""Prompt-lookup speculative decoding: greedy-exactness + draft quality.

The load-bearing property: speculative output must be TOKEN-IDENTICAL to
plain greedy decoding whatever the acceptance rate (acceptance only
changes how many forwards it takes)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.engine.speculative import (
    generate_speculative,
    pld_draft,
)
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import (
    decode_step,
    init_params,
    prefill,
)

CFG = tiny_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(21), dtype=jnp.float32)


def _plain_greedy(prompt, steps):
    cache = KVCache.create(CFG.num_layers, 1, 256, CFG.num_kv_heads,
                           CFG.head_dim, dtype=jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)
    logits, cache = prefill(PARAMS, CFG, toks, lens, cache)
    out = [int(jnp.argmax(logits[0]))]
    for s in range(1, steps):
        pos = jnp.asarray([len(prompt) + s - 1], jnp.int32)
        logits, cache = decode_step(PARAMS, CFG,
                                    jnp.asarray([out[-1]], jnp.int32), pos,
                                    cache)
        out.append(int(jnp.argmax(logits[0])))
        if out[-1] in CFG.eos_token_ids:
            break
    return out


def test_pld_draft_copies_repeating_continuation():
    """History '...A B C D ... A B C' must draft 'D ...' (the tokens that
    followed the earlier occurrence of the suffix ngram)."""
    seq = [7, 8, 9, 10, 11, 12, 5, 5, 7, 8, 9]  # suffix (7,8,9) seen at 0
    hist = np.zeros((1, 32), np.int32)
    hist[0, : len(seq)] = seq
    drafts, found = pld_draft(jnp.asarray(hist),
                              jnp.asarray([len(seq)], jnp.int32),
                              ngram=3, k=4)
    assert bool(found[0])
    assert np.asarray(drafts)[0].tolist() == [10, 11, 12, 5]


def test_speculative_matches_plain_greedy():
    prompts = [[5, 9, 17, 3], [100, 200, 300, 400, 500, 42]]
    n = 12
    cache = KVCache.create(CFG.num_layers, len(prompts), 256,
                           CFG.num_kv_heads, CFG.head_dim,
                           dtype=jnp.float32)
    got = generate_speculative(PARAMS, CFG, prompts, cache,
                               max_new_tokens=n, k=4, ngram=2)
    for i, p in enumerate(prompts):
        want = _plain_greedy(p, n)
        assert got[i][: len(want)] == want, (i, got[i], want)
        assert len(got[i]) == len(want)


def test_speculative_accepts_on_repetitive_prompt():
    """A prompt that is an exact repetition drives the tiny model into a
    loop; lookup drafts should then be accepted (fewer forwards than
    tokens). We can't assert model behavior, but the run must still be
    greedy-exact AND terminate within the iteration budget."""
    base = [11, 22, 33, 44]
    prompt = base * 6
    n = 10
    cache = KVCache.create(CFG.num_layers, 1, 256, CFG.num_kv_heads,
                           CFG.head_dim, dtype=jnp.float32)
    got = generate_speculative(PARAMS, CFG, [prompt], cache,
                               max_new_tokens=n, k=6, ngram=3)
    want = _plain_greedy(prompt, n)
    assert got[0][: len(want)] == want


def test_speculative_step_stochastic_runs():
    """Stochastic verification: one round with temperature sampling must
    emit 1..k+1 tokens per live row and keep history/lens consistent."""
    from qwen_inference_engine_tpu.engine.speculative import speculative_step

    B, S, k = 2, 128, 4
    cache = KVCache.create(CFG.num_layers, B, S, CFG.num_kv_heads,
                           CFG.head_dim, dtype=jnp.float32)
    prompts = [[5, 9, 17, 3], [7, 8, 9, 10]]
    hist = np.zeros((B, S), np.int32)
    for i, p in enumerate(prompts):
        hist[i, : len(p)] = p
    lens = jnp.asarray([4, 4], jnp.int32)
    logits, cache = prefill(PARAMS, CFG, jnp.asarray(hist[:, :4]), lens,
                            cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    history = jnp.asarray(hist).at[jnp.arange(B), lens].set(first)
    lens = lens + 1

    h2, l2, cache, done, n_new = speculative_step(
        PARAMS, CFG, history, lens, cache, jnp.zeros((B,), bool),
        jax.random.PRNGKey(3), k=k, ngram=2, greedy=False, temperature=0.9)
    n = np.asarray(n_new)
    assert ((1 <= n) & (n <= k + 1)).all()
    assert (np.asarray(l2) == np.asarray(lens) + n).all()
    # emitted tokens are in-vocab
    for i in range(B):
        row = np.asarray(h2)[i, int(lens[i]): int(l2[i])]
        assert ((0 <= row) & (row < CFG.vocab_size)).all()
