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
    # all pages returned to the pool: free or parked in the prefix cache
    assert sorted(cb._free_pages + list(cb._cached_free)) == list(range(1, 16))
    cb.check_page_invariants()


def test_continuous_batching_rejects_oversized():
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=1, page_size=4, num_pages=8,
        max_pages_per_seq=2, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    cb.submit(Request(request_id=0, prompt=[1, 2, 3], max_new_tokens=100))
    finished = cb.run_to_completion()
    assert finished[0].finish_reason == "rejected"


def test_uniform_and_ragged_decode_paths_agree():
    """decode_step(uniform_decode=True) == default path for aligned rows."""
    import numpy as np

    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import (
        decode_step,
        init_params,
        prefill,
    )

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, P = 2, 5
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, P)).astype(np.int32))
    lens = jnp.full((B,), P, jnp.int32)
    c1 = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    c2 = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    _, c1 = prefill(params, cfg, toks, lens, c1)
    _, c2 = prefill(params, cfg, toks, lens, c2)
    nxt = jnp.asarray([3, 7], jnp.int32)
    for step in range(3):
        pos = lens + step
        l1, c1 = decode_step(params, cfg, nxt, pos, c1, uniform_decode=True)
        l2, c2 = decode_step(params, cfg, nxt, pos, c2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-4, atol=1e-4, err_msg=f"step {step}")
        nxt = jnp.argmax(l1, -1).astype(jnp.int32)


def test_debug_dump_hooks_are_noops_and_printable(capsys):
    from qwen_inference_engine_tpu.utils import debug

    x = jnp.ones((2, 4), jnp.float32)
    assert debug.dump_activation("t", x) is x   # disabled: identity
    debug.enable(True)
    try:
        y = jax.jit(lambda a: debug.dump_activation("act", a) * 2)(x)
        jax.effects_barrier()
        assert float(y[0, 0]) == 2.0
        logits = jnp.arange(12.0).reshape(2, 6)
        debug.dump_top_logits("logits", logits, k=3)
        jax.effects_barrier()
    finally:
        debug.enable(False)


def test_chunked_prefill_across_ticks_matches_manual():
    """A prompt longer than prefill_chunk is prefilled one chunk per tick
    while an already-running request keeps decoding — outputs of both must
    still match the solo manual loop (no head-of-line corruption)."""
    short = [7, 8, 9]
    long = list(range(1, 41))  # 40 tokens > prefill_chunk=16 -> 3 pieces
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        prefill_chunk=16,
    )
    cb.submit(Request(request_id=0, prompt=short, max_new_tokens=8))
    done = cb.step()  # short request prefilled + first decode
    cb.submit(Request(request_id=1, prompt=long, max_new_tokens=6))
    ticks = 0
    while cb.has_work():
        done += cb.step()  # step() drains: collect as we go
        ticks += 1
        assert ticks < 64
    by_id = {f.request_id: f for f in done + cb.run_to_completion()}
    assert not cb.has_work()
    for rid, prompt, n in ((0, short, 8), (1, long, 6)):
        expect = _manual_greedy(prompt, n)
        got = by_id[rid].token_ids
        assert got[: len(expect)] == expect, (rid, got, expect)


def test_scheduler_stats_decode_throughput_nonzero():
    """step() must record real elapsed decode time so the HTTP /stats
    decode_tokens_per_s is observable in serving mode (it divided by an
    always-zero accumulator before)."""
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    cb.submit(Request(request_id=0, prompt=[5, 6, 7], max_new_tokens=5))
    while cb.has_work():
        cb.step()
    snap = cb.metrics.snapshot()
    assert snap["decode_tokens"] >= 4
    assert snap["decode_tokens_per_s"] > 0.0
    assert snap["ttft_p50_s"] > 0.0


def test_continuous_batching_int8_kv_smoke():
    """Paged INT8-KV end to end: quantized pool + scales flow through
    admission, chunked prefill, decode, and completion."""
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.int8,
    )
    assert cb.cache.quantized
    for i in range(3):
        cb.submit(Request(request_id=i, prompt=[5 + i, 9, 17, 3],
                          max_new_tokens=5))
    finished = cb.run_to_completion()
    assert sorted(f.request_id for f in finished) == [0, 1, 2]
    for f in finished:
        assert len(f.token_ids) >= 1


def test_scheduler_cancel_and_timeout():
    """Cancel frees slot+pages immediately; a deadline-expired request
    finishes with reason 'timeout' instead of running on."""
    import time as _time

    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
    )
    free0 = cb._page_budget()
    cb.submit(Request(request_id=0, prompt=[5, 6, 7], max_new_tokens=50))
    cb.submit(Request(request_id=1, prompt=[8, 9], max_new_tokens=50,
                      timeout_s=0.0))  # expires on the first tick
    done = cb.step()  # admits + prefills + first decode; drains #1's timeout
    assert cb.cancel(0)
    out = {f.request_id: f for f in done + cb.run_to_completion()}
    assert out[0].finish_reason == "cancelled"
    assert out[1].finish_reason == "timeout"
    assert not cb.has_work()
    assert cb._page_budget() == free0  # all pages returned (free or parked)
    assert cb.cancel(99) is False


def test_per_request_sampling_in_decode():
    """Each slot decodes with its OWN request's temperature: a near-zero-
    temperature request in a mixed batch must reproduce the solo greedy
    output even while its neighbor samples hot."""
    prompt = [5, 9, 17, 3]
    expect = _manual_greedy(prompt, 6)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16,
        sampling=SamplingParams(temperature=1.0, top_k=50), kv_dtype=jnp.float32,
    )
    cold = SamplingParams(temperature=1e-6, top_k=1)
    hot = SamplingParams(temperature=5.0, top_k=50)
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=6,
                      sampling=cold))
    cb.submit(Request(request_id=1, prompt=[7, 8, 9], max_new_tokens=6,
                      sampling=hot))
    by_id = {f.request_id: f for f in cb.run_to_completion()}
    got = by_id[0].token_ids
    assert got[: len(expect)] == expect, (got, expect)


def test_per_request_greedy_is_exact_in_serving():
    """A greedy:true request against a sampling-default engine must emit
    the exact greedy chain for EVERY token (the decode step used to
    compile with engine-level top_k/greedy statics, so only the prefill-
    sampled first token honored the request's greedy flag)."""
    prompt = [5, 9, 17, 3]
    expect = _manual_greedy(prompt, 8)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16,
        sampling=SamplingParams(temperature=5.0, top_k=50),
        kv_dtype=jnp.float32,
    )
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=8,
                      sampling=SamplingParams(greedy=True)))
    cb.submit(Request(request_id=1, prompt=[7, 8, 9], max_new_tokens=8))
    by_id = {f.request_id: f for f in cb.run_to_completion()}
    got = by_id[0].token_ids
    assert got[: len(expect)] == expect, (got, expect)


def test_repetition_penalty_active_in_serving():
    """repetition_penalty must actually bite on the serving path (it was
    accepted per-request but silently dropped: sample() only applies it
    given a seen_mask and the scheduler never built one).  A huge penalty
    under greedy decoding must forbid immediate token repeats that the
    unpenalized chain produces."""
    prompt = [5, 9, 17, 3]

    def serve(pen):
        cb = ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=1, page_size=8, num_pages=64,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32)
        cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=12,
                          sampling=SamplingParams(
                              greedy=True, repetition_penalty=pen)))
        return cb.run_to_completion()[0].token_ids

    plain = serve(1.0)
    assert plain == _manual_greedy(prompt, 12)  # no-penalty path unchanged
    penalized = serve(1e6)
    # with a ~infinite penalty no generated token may repeat a seen one
    seen = set(prompt)
    plain_repeats = False
    for t in plain:
        plain_repeats = plain_repeats or t in seen
        seen.add(t)
    seen = set(prompt)
    for t in penalized:
        if t in CFG.eos_token_ids:
            break
        assert t not in seen, (penalized, plain)
        seen.add(t)
    if plain_repeats:  # the penalty must have changed the chain
        assert penalized != plain


def test_speculative_scheduler_greedy_token_identical():
    """Speculative mode in the paged scheduler must be token-identical to
    plain greedy serving, while actually accepting drafts (this prompt's
    greedy chain repeats a bigram continuation, so prompt-lookup hits)."""
    prompts = {0: [5, 9, 17, 3], 1: [40, 41, 42, 43]}
    expect = {rid: _manual_greedy(p, 20) for rid, p in prompts.items()}

    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=4, spec_ngram=2,
    )
    for rid, p in prompts.items():
        cb.submit(Request(request_id=rid, prompt=p, max_new_tokens=20))
    # host-draft path (per-round step): verify forwards run only when a
    # draft exists, so accepted tokens/forward over those rounds beats 1
    fins = []
    while cb.has_work():
        fins += cb.step()
    fins += cb._drain_finished()
    by_id = {f.request_id: f for f in fins}
    for rid in prompts:
        got = by_id[rid].token_ids
        assert got == expect[rid][: len(got)] and len(got) == min(
            20, len(expect[rid])), (rid, got, expect[rid])
    snap = cb.metrics.snapshot()
    assert snap["spec_rounds"] > 0
    assert snap["spec_tokens_per_forward"] > 1.0, snap
    cb.check_page_invariants()

    # chained device-PLD path (run_to_completion): every round verifies,
    # so with prompts this model barely echoes, tokens/forward sits near
    # 1.0 and the acceptance EMA backs off — identity must still hold.
    # (Chained ACCEPTANCE >1 is pinned by the self-draft chained test and
    # measured on hardware: 3.05 tok/forward, docs/PERF.md r4.)
    cb2 = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=4, spec_ngram=2,
    )
    for rid, p in prompts.items():
        cb2.submit(Request(request_id=rid, prompt=p, max_new_tokens=20))
    by_id2 = {f.request_id: f for f in cb2.run_to_completion()}
    for rid in prompts:
        assert by_id2[rid].token_ids == by_id[rid].token_ids, rid
    assert cb2.metrics.snapshot()["spec_rounds"] > 0
    cb2.check_page_invariants()


def test_speculative_scheduler_mixed_sampling_runs():
    """Speculative serving with a stochastic default and a greedy request
    in the same batch: greedy row stays exact, every request terminates."""
    prompt = [5, 9, 17, 3]
    expect = _manual_greedy(prompt, 12)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16,
        sampling=SamplingParams(temperature=1.2, top_k=50),
        kv_dtype=jnp.float32, speculative=True, spec_k=3, spec_ngram=2,
    )
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=12,
                      sampling=SamplingParams(greedy=True)))
    cb.submit(Request(request_id=1, prompt=[7, 8, 9], max_new_tokens=12))
    by_id = {f.request_id: f for f in cb.run_to_completion()}
    got = by_id[0].token_ids
    assert got == expect[: len(got)], (got, expect)
    assert len(by_id[1].token_ids) <= 12


def test_scheduler_fuzz_invariants():
    """Randomized admit/step/cancel churn: the page allocator must never
    double-book, slots and tables must stay consistent, every request
    must terminate with a sane reason, and mixing incremental step()
    collection with a final run_to_completion() must deliver each
    completion EXACTLY once (step used to return a this-tick slice
    without draining, so run_to_completion returned everything again)."""
    rng = np.random.default_rng(123)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=3, page_size=4, num_pages=48,
        max_pages_per_seq=12, sampling=GREEDY, kv_dtype=jnp.float32,
        prefill_chunk=16,
    )
    submitted = 0
    all_ids = []
    finished = []
    for it in range(60):
        action = rng.random()
        if action < 0.5 and submitted < 18:
            plen = int(rng.integers(1, 20))
            cb.submit(Request(request_id=submitted,
                              prompt=rng.integers(1, 400, plen).tolist(),
                              max_new_tokens=int(rng.integers(1, 8))))
            all_ids.append(submitted)
            submitted += 1
        elif action < 0.6 and all_ids:
            cb.cancel(int(rng.choice(all_ids)))  # may already be finished
        finished += cb.step()
        # page-pool conservation, refcounts, table ownership — every tick
        cb.check_page_invariants()
    finished += cb.run_to_completion()
    ids = [f.request_id for f in finished]
    assert len(set(ids)) == len(ids), "completion delivered twice"
    assert set(ids) == set(all_ids), "request lost or never terminated"
    for f in finished:
        assert f.finish_reason in ("eos", "length", "rejected", "cancelled",
                                   "timeout")
    assert not cb.has_work()
    assert sorted(cb._free_pages + list(cb._cached_free)) == list(
        range(1, cb.num_pages))
    cb.check_page_invariants()


# ---------------------------- prefix caching ----------------------------

def _pc_engine(**kw):
    base = dict(max_slots=2, page_size=8, num_pages=32, max_pages_per_seq=8,
                sampling=GREEDY, kv_dtype=jnp.float32)
    base.update(kw)
    return ContinuousBatchingEngine(CFG, PARAMS, **base)


def test_prefix_cache_sequential_reuse_exact():
    """Re-submitting a prompt must skip its full pages' prefill (observable
    in prefix_hit_tokens) and produce TOKEN-IDENTICAL greedy output — the
    cached KV path (prefill resuming mid-prompt over shared pages) must be
    bit-compatible with the fresh path."""
    prompt = list(range(1, 21))          # 20 tokens -> 2 full pages of 8
    expect = _manual_greedy(prompt, 6)
    cb = _pc_engine()
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=6))
    first = cb.run_to_completion()[0]
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 0
    cb.submit(Request(request_id=1, prompt=prompt, max_new_tokens=6))
    second = cb.run_to_completion()[0]
    # 2 full pages (16) + 3 tokens of the third page reused PARTIALLY via
    # the copy path (the first run registered 3 full pages of its 26
    # written tokens; prompt[16:19] matches that page's leading rows, and
    # one prompt token always remains for prefill)
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 19
    assert first.token_ids[: len(expect)] == expect
    assert second.token_ids == first.token_ids
    cb.check_page_invariants()


def test_prefix_cache_concurrent_sharing():
    """Two live requests with the same prompt share the prefix pages
    (refcount 2) without either corrupting the other; both match manual."""
    prompt = [3 * i + 1 for i in range(19)]
    expect = _manual_greedy(prompt, 5)
    cb = _pc_engine()
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=5))
    done = cb.run_to_completion()       # registers the prefix
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=5))
    cb.submit(Request(request_id=1, prompt=prompt, max_new_tokens=5))
    cb.step()                            # both admitted -> shared hits live
    shared = [p for p, n in cb._page_refs.items() if n == 2]
    assert shared, "prefix pages not shared across live requests"
    cb.check_page_invariants()
    done = {f.request_id: f for f in cb.run_to_completion()}
    for rid in (0, 1):
        assert done[rid].token_ids[: len(expect)] == expect, rid
    cb.check_page_invariants()


def test_prefix_cache_extends_into_generated_tokens():
    """Multi-turn pattern: a follow-up prompt of (prompt + the previous
    answer) hits pages covering GENERATED tokens too (their KV is known up
    to the last written position)."""
    prompt = list(range(40, 52))         # 12 tokens
    cb = _pc_engine()
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=8))
    first = cb.run_to_completion()[0]
    # sequence content in cache = prompt + generated[:-1] (last token's KV
    # is never written); follow-up turn extends the conversation
    convo = prompt + first.token_ids
    expect = _manual_greedy(convo, 4)
    cb.submit(Request(request_id=1, prompt=convo, max_new_tokens=4))
    second = cb.run_to_completion()[0]
    hits = cb.metrics.snapshot()["prefix_hit_tokens"]
    assert hits >= 16, hits              # beyond the 12-token prompt page
    assert second.token_ids[: len(expect)] == expect
    cb.check_page_invariants()


def test_prefix_cache_eviction_under_pressure():
    """Cached ref-0 pages are reclaimed when live work needs the pool, and
    correctness survives eviction (a later resubmit just re-prefills)."""
    pa = list(range(1, 18))
    cb = _pc_engine(num_pages=12, max_pages_per_seq=6)
    cb.submit(Request(request_id=0, prompt=pa, max_new_tokens=4))
    cb.run_to_completion()
    assert cb._cached_free
    # unrelated requests that need every page in the pool
    for i in range(1, 4):
        cb.submit(Request(request_id=i, prompt=[100 * i + j for j in range(17)],
                          max_new_tokens=4))
    cb.run_to_completion()
    cb.check_page_invariants()
    expect = _manual_greedy(pa, 4)
    cb.submit(Request(request_id=9, prompt=pa, max_new_tokens=4))
    out = cb.run_to_completion()[0]
    assert out.token_ids[: len(expect)] == expect
    cb.check_page_invariants()


def test_prefix_cache_disabled_unchanged():
    """prefix_cache=False keeps the plain allocator: full free list after
    completion, zero hits on an exact resubmit."""
    prompt = list(range(1, 21))
    cb = _pc_engine(prefix_cache=False)
    for rid in (0, 1):
        cb.submit(Request(request_id=rid, prompt=prompt, max_new_tokens=4))
    cb.run_to_completion()
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 0
    assert not cb._cached_free
    assert sorted(cb._free_pages) == list(range(1, cb.num_pages))
    cb.check_page_invariants()


def test_prefix_cache_int8_kv_hits():
    """Quantized KV pool: the per-page scale slabs are addressed by the
    same block-table indirection, so shared prefix pages must carry their
    scales too — outputs on a hit must match the engine's own fresh run."""
    prompt = list(range(1, 21))
    cb = _pc_engine(kv_dtype=jnp.int8)
    assert cb.cache.quantized
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=5))
    first = cb.run_to_completion()[0]
    cb.submit(Request(request_id=1, prompt=prompt, max_new_tokens=5))
    second = cb.run_to_completion()[0]
    # 16 full-page + 3 partial tokens (scales ride the page copy too)
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 19
    assert second.token_ids == first.token_ids
    cb.check_page_invariants()


def test_prefix_cache_partial_page_divergent_tail():
    """Two prompts sharing 19 of 20 tokens (divergence INSIDE the third
    page): the second request must reuse the partial page via the copy
    path and still produce exactly its own greedy continuation."""
    p1 = list(range(1, 21))
    p2 = p1[:19] + [499]                 # diverges at token 20 (page 3 row 3)
    e2 = _manual_greedy(p2, 6)
    cb = _pc_engine()
    cb.submit(Request(request_id=0, prompt=p1, max_new_tokens=6))
    cb.run_to_completion()
    cb.submit(Request(request_id=1, prompt=p2, max_new_tokens=6))
    out = cb.run_to_completion()[0]
    # 2 full pages + 3 matching rows of page 3 (p2[16:19] == p1[16:19])
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 19
    assert out.token_ids == e2, (out.token_ids, e2)
    cb.check_page_invariants()


def test_prefix_cache_sub_page_tail_registered():
    """SUB-PAGE sharing (VERDICT r4 missing #2): a finished run whose last
    page is only PARTIALLY written must still share those tail rows. With
    max_new=1 the single sampled token's KV is never written, so written
    == len(prompt) == 20 -> 2 full pages + a 4-row tail on page 3; a
    resubmit must reuse 16 + min(cap=3, 4) = 19 tokens (whole-page-only
    registration reused 16) and stay token-identical to fresh greedy."""
    prompt = list(range(1, 21))          # 20 tokens, page_size 8
    expect = _manual_greedy(prompt, 6)
    cb = _pc_engine()
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=1))
    cb.run_to_completion()
    cb.submit(Request(request_id=1, prompt=prompt, max_new_tokens=6))
    out = cb.run_to_completion()[0]
    assert cb.metrics.snapshot()["prefix_hit_tokens"] == 19
    assert out.token_ids[: len(expect)] == expect
    cb.check_page_invariants()


def test_prefix_cache_sub_page_tail_mid_prefill_eviction():
    """The registered sub-page tail participates in the normal LRU life
    cycle: park on release, revive on reuse, evict under pressure —
    invariants hold throughout."""
    pa = list(range(1, 20))              # 19 tokens: 2 full pages + 3-row tail
    cb = _pc_engine(num_pages=12, max_pages_per_seq=6)
    cb.submit(Request(request_id=0, prompt=pa, max_new_tokens=1))
    cb.run_to_completion()
    # the tail page is parked AND indexed
    assert any(h in cb._prefix_index for h in cb._cached_free.values())
    cb.check_page_invariants()
    # pool pressure evicts it; correctness survives (plain re-prefill)
    for i in range(1, 4):
        cb.submit(Request(request_id=i,
                          prompt=[100 * i + j for j in range(17)],
                          max_new_tokens=4))
    cb.run_to_completion()
    expect = _manual_greedy(pa, 4)
    cb.submit(Request(request_id=9, prompt=pa, max_new_tokens=4))
    out = cb.run_to_completion()[0]
    assert out.token_ids[: len(expect)] == expect
    cb.check_page_invariants()


def test_cache_aware_admission_prefers_hot_prefix():
    """With one free slot and a cold request ahead of a hot one in the
    queue, the hot request (cached prefix) is admitted first; the cold one
    still completes (bounded window, no starvation)."""
    hot = list(range(1, 18))             # 2 full pages once completed
    cold = [400 + i for i in range(17)]
    cb = _pc_engine(max_slots=1)
    cb.submit(Request(request_id=0, prompt=hot, max_new_tokens=4))
    cb.run_to_completion()
    cb.submit(Request(request_id=1, prompt=cold, max_new_tokens=4))
    cb.submit(Request(request_id=2, prompt=hot, max_new_tokens=4))
    cb.step()                            # one admission happens
    s = next(s for s in cb._slots if s is not None)
    assert s.request.request_id == 2, "hot request should jump the queue"
    done = {f.request_id for f in cb.run_to_completion()}
    assert done == {1, 2}
    cb.check_page_invariants()


def test_seen_mask_not_polluted_by_prefilling_slots():
    """Regression: the fused decode tick samples a (masked) garbage token
    for slots that are still mid-prefill; those tokens must NOT enter the
    slot's seen mask, or its repetition penalty later penalizes tokens
    the request never produced. Request B (long, chunked prefill, huge
    penalty) must behave exactly as when served alone."""
    prompt_b = list(range(50, 90))          # 40 tokens > prefill_chunk=16

    def serve_b(with_neighbor):
        cb = ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
            prefill_chunk=16, prefix_cache=False)
        if with_neighbor:
            # neighbor decodes while B's prefill spans several ticks
            cb.submit(Request(request_id=9, prompt=[7, 8, 9],
                              max_new_tokens=20))
            cb.step()
        cb.submit(Request(request_id=0, prompt=prompt_b, max_new_tokens=8,
                          sampling=SamplingParams(greedy=True,
                                                  repetition_penalty=1e6)))
        done = {f.request_id: f for f in cb.run_to_completion()}
        return done[0].token_ids

    assert serve_b(True) == serve_b(False)


def test_scheduler_fuzz_invariants_speculative():
    """The fuzz churn with SPECULATION on: spec rounds write up to spec_k
    positions past the final token, so the page budget and invariants must
    hold through mixed draft-hit/miss rounds, cancels, and prefix reuse.
    Repetitive prompts from a tiny token alphabet force real PLD hits."""
    rng = np.random.default_rng(321)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=3, page_size=4, num_pages=64,
        max_pages_per_seq=12, sampling=GREEDY, kv_dtype=jnp.float32,
        prefill_chunk=16, speculative=True, spec_k=3, spec_ngram=2,
    )
    submitted = 0
    all_ids = []
    finished = []
    for it in range(50):
        action = rng.random()
        if action < 0.5 and submitted < 14:
            base = rng.integers(1, 6, int(rng.integers(2, 5))).tolist()
            cb.submit(Request(request_id=submitted,
                              prompt=(base * 4)[:16],
                              max_new_tokens=int(rng.integers(1, 10))))
            all_ids.append(submitted)
            submitted += 1
        elif action < 0.6 and all_ids:
            cb.cancel(int(rng.choice(all_ids)))
        finished += cb.step()
        cb.check_page_invariants()
    finished += cb.run_to_completion()
    ids = [f.request_id for f in finished]
    assert len(set(ids)) == len(ids), "completion delivered twice"
    assert set(ids) == set(all_ids), "request lost or never terminated"
    assert not cb.has_work()
    assert sorted(cb._free_pages + list(cb._cached_free)) == list(
        range(1, cb.num_pages))
    cb.check_page_invariants()
    # the churn must actually exercise speculation (deterministic seed:
    # 9 rounds at ~3.1 accepted tokens/forward)
    assert cb.metrics.snapshot()["spec_rounds"] > 0


def test_draft_model_speculation_self_draft_full_accept():
    """Draft model == target model: greedy drafts always match the greedy
    verify chain, so every round accepts k+1 tokens — and outputs are
    token-identical to plain greedy serving. Exercises the whole fused
    drafter-scan + verify jit and the lockstep drafter cache."""
    prompts = {0: [5, 9, 17, 3], 1: list(range(30, 48))}  # 18 > one page
    expect = {rid: _manual_greedy(p, 16) for rid, p in prompts.items()}
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=3,
        draft_params=PARAMS, draft_cfg=CFG,
    )
    assert cb._model_draft
    for rid, p in prompts.items():
        cb.submit(Request(request_id=rid, prompt=p, max_new_tokens=16))
    by_id = {f.request_id: f for f in cb.run_to_completion()}
    for rid in prompts:
        got = by_id[rid].token_ids
        assert got == expect[rid][: len(got)], (rid, got, expect[rid])
    snap = cb.metrics.snapshot()
    # self-drafting accepts everything: k+1 = 4 tokens per forward (the
    # final truncated round may emit fewer)
    assert snap["spec_tokens_per_forward"] > 3.0, snap
    cb.check_page_invariants()


def test_draft_model_speculation_weak_drafter_still_exact():
    """A DIFFERENT (weaker) drafter must not change greedy outputs — only
    the acceptance rate. The drafter here is a differently-initialized
    tiny model, so drafts rarely match; every round still emits >= 1
    correct token."""
    from qwen_inference_engine_tpu.models.qwen import init_params

    draft_params = init_params(CFG, jax.random.PRNGKey(999),
                               dtype=jnp.float32)
    prompt = [7, 8, 9, 10]
    expect = _manual_greedy(prompt, 12)
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=3,
        draft_params=draft_params, draft_cfg=CFG,
    )
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=12))
    got = cb.run_to_completion()[0].token_ids
    assert got == expect[: len(got)], (got, expect)
    assert cb.metrics.snapshot()["spec_rounds"] > 0
    cb.check_page_invariants()


def test_draft_model_speculation_with_prefix_cache():
    """Draft-model speculation + prefix cache: a resubmitted prompt hits
    cached pages in BOTH pools (they are written in lockstep), and the
    second run stays token-identical."""
    prompt = list(range(1, 21))
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=2, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=3,
        draft_params=PARAMS, draft_cfg=CFG,
    )
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=6))
    first = cb.run_to_completion()[0]
    cb.submit(Request(request_id=1, prompt=prompt, max_new_tokens=6))
    second = cb.run_to_completion()[0]
    assert cb.metrics.snapshot()["prefix_hit_tokens"] > 0
    assert second.token_ids == first.token_ids
    cb.check_page_invariants()


def test_draft_model_spec_chained_rounds_match_per_round_step():
    """Device-chained speculation rounds (step_batch: n rounds, ONE host
    sync, next-round inputs computed in-graph) must be token-identical to
    per-round step() stepping. A WEAK drafter makes acceptance vary per
    row per round, stressing the in-graph tok_prev/tok_last/pos handoff;
    max_new values differ per request so the round cap + post-EOS/length
    discard paths both run."""
    from qwen_inference_engine_tpu.models.qwen import init_params as ip

    draft_params = ip(CFG, jax.random.PRNGKey(999), dtype=jnp.float32)
    prompts = {0: [5, 9, 17, 3], 1: list(range(30, 48)), 2: [7, 8, 9]}
    max_new = {0: 15, 1: 9, 2: 22}

    def build():
        return ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=3, page_size=8, num_pages=64,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
            speculative=True, spec_k=3,
            draft_params=draft_params, draft_cfg=CFG)

    outs = {}
    for mode in ("step", "batch"):
        cb = build()
        for rid, p in prompts.items():
            cb.submit(Request(request_id=rid, prompt=p,
                              max_new_tokens=max_new[rid]))
        fins = []
        if mode == "step":
            while cb.has_work():
                fins += cb.step()
            fins += cb._drain_finished()
        else:
            fins += cb.run_to_completion(sync_every=4)
        outs[mode] = {f.request_id: f.token_ids for f in fins}
        cb.check_page_invariants()
        assert cb.metrics.snapshot()["spec_rounds"] > 0
    assert outs["step"] == outs["batch"], outs


def test_pld_chained_batches_match_per_round_step():
    """Device-chained PLD rounds (drafts from the device history buffer,
    one sync per batch) must be token-identical to the host-draft
    per-round step() path under greedy — across repetitive prompts (high
    acceptance) and non-repetitive ones (drafts always rejected), with
    differing max_new so the cap + discard paths run."""
    base = [11, 22, 33, 44]
    prompts = {0: base * 5, 1: [5, 9, 17, 3], 2: list(range(60, 75))}
    max_new = {0: 18, 1: 11, 2: 7}

    def build():
        return ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=3, page_size=8, num_pages=64,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
            speculative=True, spec_k=4, spec_ngram=2)

    outs = {}
    for mode in ("step", "batch"):
        cb = build()
        for rid, p in prompts.items():
            cb.submit(Request(request_id=rid, prompt=p,
                              max_new_tokens=max_new[rid]))
        fins = []
        if mode == "step":
            while cb.has_work():
                fins += cb.step()
            fins += cb._drain_finished()
        else:
            fins += cb.run_to_completion(sync_every=4)
            assert cb._hist_buf is not None, "chained PLD path never ran"
        outs[mode] = {f.request_id: f.token_ids for f in fins}
        cb.check_page_invariants()
    assert outs["step"] == outs["batch"], outs


def test_pld_chained_slot_reuse_resyncs_history():
    """A new request admitted into a freed slot must not see the previous
    tenant's device history (watermark reset on _finish)."""
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=1, page_size=8, num_pages=32,
        max_pages_per_seq=8, sampling=GREEDY, kv_dtype=jnp.float32,
        speculative=True, spec_k=3, spec_ngram=2, prefix_cache=False)
    first_prompt = [11, 22, 33, 44] * 4
    cb.submit(Request(request_id=0, prompt=first_prompt, max_new_tokens=8))
    cb.run_to_completion(sync_every=4)
    second_prompt = [7, 8, 9, 10]
    expect = _manual_greedy(second_prompt, 8)
    cb.submit(Request(request_id=1, prompt=second_prompt, max_new_tokens=8))
    got = cb.run_to_completion(sync_every=4)[0].token_ids
    assert got == expect[: len(got)], (got, expect)


def test_engine_per_call_penalty_not_dropped():
    """Engine.generate(sampling=...) with a penalty must apply it even
    when the engine was built with penalty-free defaults (advisor r3:
    track_repetition froze at __init__ and silently dropped it). A huge
    presence penalty under greedy decoding forbids every seen token, so
    no generated token may repeat the prompt or an earlier output."""
    prompt = [5, 9, 17, 3]
    eng = Engine(CFG, PARAMS, max_batch=1, max_seq=128, sampling=GREEDY,
                 kv_dtype=jnp.float32)
    sp = SamplingParams(greedy=True, presence_penalty=50.0)
    res = eng.generate([prompt], max_new_tokens=10, sampling=sp)
    toks = res.token_ids[0]
    seen = set(prompt)
    for t in toks:
        if t in CFG.eos_token_ids:
            break
        assert t not in seen, (t, toks)
        seen.add(t)
    # and the penalty-free path still repeats freely (sanity: the two
    # calls genuinely differ)
    res0 = eng.generate([prompt], max_new_tokens=10)
    assert res0.token_ids[0] != toks


def test_top_k_cap_widens_compiled_selection():
    """--top-k-cap sizes the compiled top-k width independently of the
    default top_k (advisor r3: a server with default top_k=50 rejected
    any request with top_k in (64, vocab) and had no remedy short of a
    restart)."""
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=1, page_size=8, num_pages=32,
        max_pages_per_seq=8, kv_dtype=jnp.float32,
        sampling=SamplingParams(temperature=0.8, top_k=50),
        top_k_cap=256)
    assert cb.k_cap == 256
    cb.submit(Request(request_id=0, prompt=[5, 9, 17], max_new_tokens=3,
                      sampling=SamplingParams(temperature=0.8, top_k=200)))
    fins = cb.run_to_completion()
    assert len(fins) == 1 and len(fins[0].token_ids) == 3
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=1, page_size=8, num_pages=32,
            max_pages_per_seq=8, kv_dtype=jnp.float32,
            sampling=SamplingParams(temperature=0.8, top_k=50),
            top_k_cap=10)


def test_per_request_stop_token_ids():
    """A request-supplied stop id terminates generation like EOS (the
    reference hardcodes one EOS; per-request stop sets are serving API
    table stakes)."""
    prompt = [5, 9, 17, 3]
    full = _manual_greedy(prompt, 10)
    assert len(full) >= 3
    stop_at = full[2]          # stop on the third greedy token
    cb = ContinuousBatchingEngine(
        CFG, PARAMS, max_slots=1, page_size=8, num_pages=64,
        max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32)
    cb.submit(Request(request_id=0, prompt=prompt, max_new_tokens=10,
                      stop_token_ids=[stop_at]))
    out = cb.run_to_completion()[0]
    assert out.finish_reason == "eos"
    assert out.token_ids == full[:3], (out.token_ids, full)


def test_mixed_chain_batch_matches_per_tick_step():
    """step_batch with a slot MID-PREFILL (interior pieces) chains
    [piece + decode] pairs on device with one sync; outputs must be
    token-identical to per-tick step() serving — stochastic rows
    included (the rkey/_step_count sequence matches exactly). The long
    prompt has several interior chunks so the mixed-chain path engages
    for multiple windows."""
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams

    long_prompt = [(3 * j) % 200 + 1 for j in range(40)]
    shorts = [[5, 9, 17, 3], [7, 8, 9]]
    stoch = SamplingParams(temperature=0.8, top_k=30)

    def build():
        cb = ContinuousBatchingEngine(
            CFG, PARAMS, max_slots=3, page_size=8, num_pages=96,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
            prefill_chunk=8, seed=11,
        )
        for i, p in enumerate(shorts):
            cb.submit(Request(request_id=i, prompt=p, max_new_tokens=24,
                              sampling=stoch if i == 1 else None))
        # decodes start first; the long prompt arrives once they run
        for _ in range(3):
            cb.step()
        cb.submit(Request(request_id=9, prompt=long_prompt,
                          max_new_tokens=4))
        return cb

    ref_cb = build()
    ref = {}
    while ref_cb.has_work():
        for f in ref_cb.step():
            ref[f.request_id] = f.token_ids
    for f in ref_cb.run_to_completion():
        ref[f.request_id] = f.token_ids

    got_cb = build()
    calls = []
    orig = got_cb._mixed_chain_batch
    got_cb._mixed_chain_batch = lambda n, d, t: (calls.append(n)
                                                 or orig(n, d, t))
    got = {}
    while got_cb.has_work():
        for f in got_cb.step_batch(4):
            got[f.request_id] = f.token_ids
    for f in got_cb.run_to_completion():
        got[f.request_id] = f.token_ids
    got_cb.check_page_invariants()
    assert calls and max(calls) >= 2, calls  # multi-pair windows ran
    assert got == ref, (got, ref)


def test_speculative_scheduler_moe_target_token_identical():
    """PLD speculation with an MoE TARGET model: the verify forward
    flattens [B, k+1] to B*(k+1) rows through the router and the grouped
    expert path (models/qwen.py moe_mlp) — the M-fill lever docs/PERF.md
    round-5 names for the per-expert pass waste. Spec serving must stay
    token-identical to plain serving on the same MoE model."""
    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64).replace(name="tiny-moe")
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    prompts = {0: [5, 9, 17, 3, 5, 9, 17, 3], 1: [40, 41, 42, 43]}

    def run(spec):
        cb = ContinuousBatchingEngine(
            cfg, params, max_slots=2, page_size=8, num_pages=64,
            max_pages_per_seq=16, sampling=GREEDY, kv_dtype=jnp.float32,
            speculative=spec, spec_k=3, spec_ngram=2)
        for rid, p in prompts.items():
            cb.submit(Request(request_id=rid, prompt=p, max_new_tokens=16))
        out = {f.request_id: f.token_ids for f in cb.run_to_completion()}
        cb.check_page_invariants()
        return out, cb.metrics.snapshot()

    plain, _ = run(False)
    spec, snap = run(True)
    assert spec == plain, (spec, plain)
    assert snap["spec_rounds"] > 0
