"""Pipeline-parallel forward (parallel/pp_step.py) vs the single-device
path: layer-staged weights/KV, ppermute ring, masked cache commits."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import (
    decode_step,
    init_params,
    prefill,
)
from qwen_inference_engine_tpu.parallel.pp_step import (
    make_pp_forward_fn,
    make_pp_mesh,
    shard_for_pp,
    supports_pp,
)

CFG = tiny_config(num_layers=4)


def test_pp_prefill_and_decode_match_single_device(devices8):
    mesh = make_pp_mesh(devices=devices8[:4])  # 4 stages x 1 layer
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert supports_pp(CFG, params, 4)
    B, T = 2, 8
    rng = np.random.default_rng(0)
    prompts = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)

    # reference
    cache_r = KVCache.create(CFG.num_layers, B, 64, CFG.num_kv_heads,
                             CFG.head_dim, dtype=jnp.float32)
    ref_logits, cache_r = prefill(params, CFG, prompts, lens, cache_r)
    ref = [ref_logits]
    tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    for s in range(3):
        l, cache_r = decode_step(params, CFG, tok, lens + s, cache_r,
                                 uniform_decode=True)
        ref.append(l)
        tok = jnp.argmax(l, -1).astype(jnp.int32)

    # pipeline
    cache = KVCache.create(CFG.num_layers, B, 64, CFG.num_kv_heads,
                           CFG.head_dim, dtype=jnp.float32)
    params_s, cache_s = shard_for_pp(params, cache, mesh)
    pre = jax.jit(make_pp_forward_fn(CFG, mesh, params, cache))
    dec = jax.jit(make_pp_forward_fn(CFG, mesh, params, cache,
                                     uniform_decode=True))
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits, cache_s = pre(params_s, prompts, positions, lens, cache_s)
    got = [logits]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(3):
        pos = (lens + s)[:, None]
        l, cache_s = dec(params_s, tok[:, None], pos, lens, cache_s)
        got.append(l)
        tok = jnp.argmax(l, -1).astype(jnp.int32)

    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=f"step {i}")


def test_pp_1f1b_decode_matches_single_device(devices8):
    """Microbatched 1F1B pipeline decode: greedy tokens for every
    microbatch must equal the single-device decode."""
    from qwen_inference_engine_tpu.parallel.pp_step import (
        make_pp_decode_1f1b,
    )

    stages, b, steps, T = 4, 2, 3, 6
    mesh = make_pp_mesh(devices=devices8[:stages])
    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    M = stages
    B = M * b
    rng = np.random.default_rng(7)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)

    cache = KVCache.create(cfg.num_layers, B, 64, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    logits, cache = prefill(params, cfg, prompts, lens, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)

    # single-device reference continues from the prefill
    ref_cache = jax.tree.map(lambda a: a, cache)
    ref = [first]
    tok = first
    for s in range(steps):
        l, ref_cache = decode_step(params, cfg, tok, lens + s, ref_cache,
                                   uniform_decode=True)
        tok = jnp.argmax(l, -1).astype(jnp.int32)
        ref.append(tok)
    ref = np.asarray(jnp.stack(ref[1:]))            # [steps, B]

    from qwen_inference_engine_tpu.parallel.pp_step import shard_for_pp

    params_s, cache_s = shard_for_pp(params, cache, mesh)
    fn = make_pp_decode_1f1b(cfg, mesh, params, cache,
                             microbatch_rows=b, steps=steps)
    init_toks = first.reshape(M, b)
    init_pos = jnp.full((M,), T, jnp.int32)         # uniform prompt length
    toks, cache_s = fn(params_s, init_toks, init_pos, cache_s)
    got = np.asarray(toks).reshape(steps, M * b)    # [steps, B]
    np.testing.assert_array_equal(got, ref)


def test_pp_1f1b_zero_copy_cache_matches_sliced(devices8):
    """ROADMAP #6: the zero-copy 1F1B variant (full cache + per-tick row
    window in the kernels' scalar prefetch) must emit exactly the tokens
    of the sliced variant / single-device decode."""
    import qwen_inference_engine_tpu.ops.decode_attention as da
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.parallel.pp_step import (
        make_pp_decode_1f1b,
        shard_for_pp,
    )
    from tests.helpers import interpret_pallas as interpret

    stages, b, steps, T = 4, 2, 3, 6
    mesh = make_pp_mesh(devices=devices8[:stages])
    # kernel-capable shapes: head_dim 128, cache S a 256-multiple
    cfg = tiny_config(num_layers=4, num_heads=4, num_kv_heads=2,
                      head_dim=128, hidden_size=256)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    M = stages
    B = M * b
    rng = np.random.default_rng(9)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    cache = KVCache.create(cfg.num_layers, B, 256, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    logits, cache = prefill(params, cfg, prompts, lens, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)

    ref_cache = jax.tree.map(lambda a: a, cache)
    ref, tok = [], first
    for s in range(steps):
        l, ref_cache = decode_step(params, cfg, tok, lens + s, ref_cache,
                                   uniform_decode=True, attn_impl="xla")
        tok = jnp.argmax(l, -1).astype(jnp.int32)
        ref.append(tok)
    ref = np.asarray(jnp.stack(ref))

    params_s, cache_s = shard_for_pp(params, cache, mesh)
    fn = make_pp_decode_1f1b(cfg, mesh, params, cache, microbatch_rows=b,
                             steps=steps, use_pallas=True,
                             zero_copy_cache=True)
    with interpret(da), interpret(ka):
        toks, cache_s = fn(params_s, first.reshape(M, b),
                           jnp.full((M,), T, jnp.int32), cache_s)
    got = np.asarray(toks).reshape(steps, M * b)
    np.testing.assert_array_equal(got, ref)


def test_pp_1f1b_decode_int8_kv(devices8):
    """1F1B pipeline decode over a stage-sharded INT8 KV cache (scales
    threaded through the carry): greedy tokens == single-device decode."""
    stages, b, steps, T = 4, 2, 3, 6
    from qwen_inference_engine_tpu.parallel.pp_step import (
        make_pp_decode_1f1b,
        shard_for_pp,
    )

    mesh = make_pp_mesh(devices=devices8[:stages])
    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    M = stages
    B = M * b
    rng = np.random.default_rng(13)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    cache = KVCache.create(cfg.num_layers, B, 64, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.int8)
    logits, cache = prefill(params, cfg, prompts, lens, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)

    ref_cache = jax.tree.map(lambda a: a, cache)
    ref, tok = [], first
    for s in range(steps):
        l, ref_cache = decode_step(params, cfg, tok, lens + s, ref_cache,
                                   uniform_decode=True)
        tok = jnp.argmax(l, -1).astype(jnp.int32)
        ref.append(tok)
    ref = np.asarray(jnp.stack(ref))

    params_s, cache_s = shard_for_pp(params, cache, mesh)
    fn = make_pp_decode_1f1b(cfg, mesh, params, cache, microbatch_rows=b,
                             steps=steps)
    toks, cache_s = fn(params_s, first.reshape(M, b),
                       jnp.full((M,), T, jnp.int32), cache_s)
    got = np.asarray(toks).reshape(steps, M * b)
    np.testing.assert_array_equal(got, ref)


def test_pp_fifo_scheduler_serves_waves(devices8):
    """The PP serving surface (engine/pp_scheduler.PPFifoScheduler):
    greedy outputs over a 4-stage pipeline mesh must be token-identical
    to the single-device paged scheduler. Covers BOTH decode paths —
    aligned full-batch greedy waves ride the 1F1B pipeline, ragged waves
    take the per-tick sampled pipeline forward (VERDICT r3 #6)."""
    from qwen_inference_engine_tpu.engine.pp_scheduler import PPFifoScheduler
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams

    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    # wave A: 4 ALIGNED prompts (1F1B path); wave B: ragged (tick path)
    aligned = {i: [10 + i, 20 + i, 30 + i, 40 + i] for i in range(4)}
    ragged = {10: [5, 9, 17], 11: list(range(50, 60))}

    ref_cb = ContinuousBatchingEngine(
        cfg, params, max_slots=4, page_size=8, num_pages=64,
        max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
        prefix_cache=False)
    for rid, p in {**aligned, **ragged}.items():
        ref_cb.submit(Request(request_id=rid, prompt=p, max_new_tokens=6))
    ref = {f.request_id: f.token_ids for f in ref_cb.run_to_completion()}

    mesh = make_pp_mesh(devices=devices8[:4])
    pp = PPFifoScheduler(cfg, params, mesh=mesh, max_batch=4, max_seq=64,
                         kv_dtype=jnp.float32, sampling=greedy)
    for rid, p in aligned.items():
        pp.submit(Request(request_id=rid, prompt=p, max_new_tokens=6))
    got = {f.request_id: f.token_ids for f in pp.run_to_completion()}
    # second wave on the same scheduler instance (cache reuse across waves)
    for rid, p in ragged.items():
        pp.submit(Request(request_id=rid, prompt=p, max_new_tokens=6))
    got.update({f.request_id: f.token_ids for f in pp.run_to_completion()})
    assert got == ref, (got, ref)


def test_pp_1f1b_sampled_waves(devices8):
    """In-pipeline sampling (ROADMAP #9): an aligned full-batch wave with
    MIXED per-row sampling (greedy + stochastic rows, no penalties) rides
    the 1F1B pipeline with sample_rows running on stage 0 between hops.
    Greedy rows must stay token-identical to the single-device greedy
    scheduler (sample_rows greedy rows take the exact argmax regardless
    of the key schedule); the run must be deterministic per seed; and the
    sampled-1F1B jit entry must actually have been used."""
    from qwen_inference_engine_tpu.engine.pp_scheduler import PPFifoScheduler
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams

    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    stoch = SamplingParams(temperature=0.9, top_k=20)
    # same-length prompts => aligned wave
    prompts = {i: [10 + i, 20 + i, 30 + i, 40 + i] for i in range(4)}
    sampling_of = {0: greedy, 1: stoch, 2: greedy, 3: stoch}

    ref_cb = ContinuousBatchingEngine(
        cfg, params, max_slots=4, page_size=8, num_pages=64,
        max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
        prefix_cache=False)
    for rid in (0, 2):
        ref_cb.submit(Request(request_id=rid, prompt=prompts[rid],
                              max_new_tokens=6))
    ref = {f.request_id: f.token_ids for f in ref_cb.run_to_completion()}

    def run():
        mesh = make_pp_mesh(devices=devices8[:4])
        pp = PPFifoScheduler(cfg, params, mesh=mesh, max_batch=4,
                             max_seq=64, kv_dtype=jnp.float32,
                             sampling=greedy, seed=7)
        for rid, p in prompts.items():
            pp.submit(Request(request_id=rid, prompt=p, max_new_tokens=6,
                              sampling=sampling_of[rid]))
        got = {f.request_id: f.token_ids for f in pp.run_to_completion()}
        used_sampled_1f1b = any(
            k[0] == "pp_1f1b" and k[2] for k in pp._jit_cache)
        return got, used_sampled_1f1b

    got1, used1 = run()
    got2, used2 = run()
    assert used1 and used2, "sampled 1F1B path did not engage"
    assert got1 == got2, "sampled wave must be deterministic per seed"
    for rid in (0, 2):
        assert got1[rid] == ref[rid], (rid, got1[rid], ref[rid])
    for rid in (1, 3):
        assert len(got1[rid]) >= 1


def test_pp_1f1b_penalized_waves(devices8):
    """Penalty rows ride the 1F1B pipeline (the last per-tick-only class):
    the seen mask is carried through the tick scan on stage 0, so greedy
    rows with repetition/presence penalties must be token-identical to
    the single-device scheduler's penalized output — and the penalized
    1F1B jit entry (not the per-tick fallback) must have served them."""
    from qwen_inference_engine_tpu.engine.pp_scheduler import PPFifoScheduler
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams

    cfg = tiny_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    pen = SamplingParams(greedy=True, repetition_penalty=1e6,
                         presence_penalty=0.5)
    prompts = {i: [10 + i, 20 + i, 30 + i, 40 + i] for i in range(4)}

    ref_cb = ContinuousBatchingEngine(
        cfg, params, max_slots=4, page_size=8, num_pages=64,
        max_pages_per_seq=8, sampling=pen, kv_dtype=jnp.float32,
        prefix_cache=False)
    for rid, p in prompts.items():
        ref_cb.submit(Request(request_id=rid, prompt=p, max_new_tokens=8))
    ref = {f.request_id: f.token_ids for f in ref_cb.run_to_completion()}

    mesh = make_pp_mesh(devices=devices8[:4])
    pp = PPFifoScheduler(cfg, params, mesh=mesh, max_batch=4, max_seq=64,
                         kv_dtype=jnp.float32, sampling=pen)
    for rid, p in prompts.items():
        pp.submit(Request(request_id=rid, prompt=p, max_new_tokens=8))
    got = {f.request_id: f.token_ids for f in pp.run_to_completion()}
    assert any(k[0] == "pp_1f1b" and len(k) == 4 and k[3]
               for k in pp._jit_cache), "penalized 1F1B path did not engage"
    assert got == ref, (got, ref)
    # the penalty actually bit: no generated token repeats prompt/history
    for rid, toks in got.items():
        seen = set(prompts[rid])
        for t in toks:
            if t in cfg.eos_token_ids:
                break
            assert t not in seen, (rid, toks)
            seen.add(t)
