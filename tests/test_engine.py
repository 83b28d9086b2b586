"""Engine + continuous-batching scheduler tests.

Cross-checks: greedy generation must be identical between (a) the
fixed-batch Engine (contiguous cache), (b) the ContinuousBatchingEngine
(paged cache, slot scheduling), and (c) a manual prefill/decode loop —
regardless of batching, padding, admission order, or page size."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.engine.engine import Engine
from qwen_inference_engine_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import decode_step, init_params, prefill
from qwen_inference_engine_tpu.ops.sampling import SamplingParams

CFG = tiny_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42), dtype=jnp.float32)
GREEDY = SamplingParams(greedy=True)


def _manual_greedy(prompt, steps):
    cache = KVCache.create(CFG.num_layers, 1, 128, CFG.num_kv_heads, CFG.head_dim,
                           dtype=jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)
    logits, cache = prefill(PARAMS, CFG, toks, lens, cache)
    out = [int(jnp.argmax(logits[0]))]
    for s in range(1, steps):
        pos = jnp.asarray([len(prompt) + s - 1], jnp.int32)
        logits, cache = decode_step(PARAMS, CFG, jnp.asarray([out[-1]], jnp.int32),
                                    pos, cache)
        out.append(int(jnp.argmax(logits[0])))
        if out[-1] in CFG.eos_token_ids:
            break
    return out


def test_engine_greedy_matches_manual():
    prompts = [[5, 9, 17, 3], [100, 200, 300, 400, 500, 42]]
    eng = Engine(CFG, PARAMS, max_batch=2, max_seq=128, sampling=GREEDY,
                 kv_dtype=jnp.float32)
    res = eng.generate(prompts, max_new_tokens=8)
    for i, p in enumerate(prompts):
        expect = _manual_greedy(p, 8)
        assert res.token_ids[i][: len(expect)] == expect, (i, res.token_ids[i], expect)


def test_engine_eos_stops():
    """Force EOS as the argmax: engine must stop early and clip output."""
    prompts = [[1, 2, 3]]
    eng = Engine(CFG, PARAMS, max_batch=1, max_seq=64, sampling=GREEDY,
                 kv_dtype=jnp.float32)
    res = eng.generate(prompts, max_new_tokens=20)
    seq = res.token_ids[0]
    assert len(seq) <= 20
    # if EOS appeared it must be the final token
    for t in seq[:-1]:
        assert t not in CFG.eos_token_ids


def test_engine_batch_independence():
    """A sequence's output must not depend on what else is in the batch."""
    eng = Engine(CFG, PARAMS, max_batch=2, max_seq=128, sampling=GREEDY,
                 kv_dtype=jnp.float32)
    solo = eng.generate([[7, 8, 9]], max_new_tokens=6).token_ids[0]
    pair = eng.generate([[7, 8, 9], [50, 60]], max_new_tokens=6).token_ids[0]
    assert solo == pair


def test_continuous_batching_matches_engine():
    prompts = [[5, 9, 17, 3], [100, 200, 300, 400, 500, 42], [7, 8, 9]]
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    for i, p in enumerate(prompts):
        cb.submit(Request(request_id=i, prompt=p, max_new_tokens=6))
    finished = cb.run_to_completion()
    assert len(finished) == 3
    by_id = {f.request_id: f for f in finished}
    for i, p in enumerate(prompts):
        expect = _manual_greedy(p, 6)
        got = by_id[i].token_ids
        assert got[: len(expect)] == expect, (i, got, expect)


def test_continuous_batching_admission_control():
    """More requests than slots/pages: everything still completes, and the
    page allocator never double-books (checked via distinct page sets)."""
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=4, num_pages=16,
        max_pages_per_seq=8, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    for i in range(5):
        cb.submit(Request(request_id=i, prompt=[i + 1, i + 2, i + 3],
                          max_new_tokens=4))
    finished = cb.run_to_completion()
    assert sorted(f.request_id for f in finished) == list(range(5))
    for f in finished:
        assert len(f.token_ids) >= 1
    # all pages returned to the free list (page 0 reserved)
    assert sorted(cb._free_pages) == list(range(1, 16))


def test_continuous_batching_rejects_oversized():
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=1, page_size=4, num_pages=8,
        max_pages_per_seq=2, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    cb.submit(Request(request_id=0, prompt=[1, 2, 3], max_new_tokens=100))
    finished = cb.run_to_completion()
    assert finished[0].finish_reason == "rejected"
