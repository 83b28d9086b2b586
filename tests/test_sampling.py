"""Sampling tests: determinism, top-k restriction, top-p mass, repetition
penalty (the op the reference declares but never implements,
layers/include/layers_include.cuh:33)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.ops.sampling import (
    SamplingParams,
    apply_repetition_penalty,
    sample,
    seen_mask_from_prompts,
    update_seen_mask,
)


def test_greedy_picks_argmax():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 100)), jnp.float32)
    tok = sample(logits, jax.random.PRNGKey(0), SamplingParams(greedy=True))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(jnp.argmax(logits, -1)))


def test_topk_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 1000)), jnp.float32)
    top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
    params = SamplingParams(temperature=1.0, top_k=5)
    for step in range(30):
        key = jax.random.fold_in(jax.random.PRNGKey(7), step)
        tok = np.asarray(sample(logits, key, params))
        for b in range(2):
            assert tok[b] in top5[b]


def test_fold_in_determinism():
    """Same seed+step → same token (reference: curand_init(seed, subseq=step),
    logit_decode.cu:255-260)."""
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(1, 500)), jnp.float32)
    params = SamplingParams(temperature=0.7, top_k=50)
    key = jax.random.fold_in(jax.random.PRNGKey(1234), 3)
    t1 = sample(logits, key, params)
    t2 = sample(logits, jax.random.fold_in(jax.random.PRNGKey(1234), 3), params)
    assert int(t1[0]) == int(t2[0])


def test_top_p_keeps_nucleus():
    # one dominant token (p≈0.97) → top_p=0.5 must always return it
    logits = jnp.zeros((1, 10), jnp.float32).at[0, 3].set(5.0)
    params = SamplingParams(temperature=1.0, top_k=10, top_p=0.5)
    for step in range(20):
        tok = sample(logits, jax.random.fold_in(jax.random.PRNGKey(0), step), params)
        assert int(tok[0]) == 3


def test_repetition_penalty_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0]], jnp.float32)
    seen = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(logits, seen, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


def test_seen_mask_tracking():
    prompts = jnp.asarray([[5, 7, 7, 0]], jnp.int32)
    lens = jnp.asarray([3])
    mask = seen_mask_from_prompts(prompts, lens, 10)
    expect = np.zeros((1, 10), bool)
    expect[0, [5, 7]] = True  # token 0 at a padded slot is excluded
    np.testing.assert_array_equal(np.asarray(mask), expect)
    mask = update_seen_mask(mask, jnp.asarray([2]))
    assert bool(mask[0, 2])


def test_presence_penalty_blocks_repeats():
    """Additive presence penalty (OpenAI semantics): a large penalty makes
    seen tokens unreachable even for greedy argmax; 0 changes nothing."""
    import numpy as np

    from qwen_inference_engine_tpu.ops.sampling import sample_rows

    V = 16
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, V)).astype(np.float32))
    seen = jnp.zeros((2, V), bool).at[0, int(jnp.argmax(logits[0]))].set(True)
    kw = dict(
        k_cap=8,
        temperature=jnp.ones((2,), jnp.float32),
        top_p=jnp.ones((2,), jnp.float32),
        top_k=jnp.zeros((2,), jnp.int32),
        greedy=jnp.ones((2,), bool),
        repetition_penalty=jnp.ones((2,), jnp.float32),
    )
    base = sample_rows(logits, jax.random.PRNGKey(0), seen_mask=seen,
                       presence_penalty=jnp.zeros((2,), jnp.float32), **kw)
    pen = sample_rows(logits, jax.random.PRNGKey(0), seen_mask=seen,
                      presence_penalty=jnp.full((2,), 100.0, jnp.float32),
                      **kw)
    # row 0's argmax was seen: the penalty must move it; row 1 unchanged
    assert int(base[0]) == int(jnp.argmax(logits[0]))
    assert int(pen[0]) != int(base[0])
    assert int(pen[1]) == int(base[1])
