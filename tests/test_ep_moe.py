"""Expert-parallel MoE all-to-all routing vs the single-device oracle.

Runs on the virtual CPU mesh (conftest forces 8 host devices); the routed
program must reproduce models.qwen.moe_mlp bitwise-nearly-bit — same
top-k, same grouping, no token dropping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.parallel.ep_moe import ep_moe_layer


def _mesh(n):
    devs = jax.devices()[:n]
    return Mesh(np.asarray(devs), ("ep",))


@pytest.mark.parametrize("ep,E,top_k", [(4, 8, 2), (2, 8, 3), (8, 8, 2)])
def test_ep_moe_matches_single_device(ep, E, top_k):
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.models.qwen import moe_mlp

    N, D, Fm = 24, 64, 32
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5

    ref = moe_mlp(h, router, wg, wu, wd, top_k, True, layer=0)

    mesh = _mesh(ep)
    pspec_h = P("ep", None)
    pspec_w = P(None, "ep", None, None)

    @jax.jit
    def run(h, router, wg, wu, wd):
        def fn(h, router, wg, wu, wd):
            return ep_moe_layer(h, router, wg[0], wu[0], wd[0], top_k, True,
                                "ep")
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(pspec_h, P(None, None), pspec_w, pspec_w, pspec_w),
            out_specs=pspec_h)(h, router, wg, wu, wd)

    got = run(h, router, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_moe_skewed_routing_no_drops():
    """A router biased so nearly all tokens hit one device's experts must
    still route exactly (capacity = worst case, never drops)."""
    ep, E, top_k = 4, 8, 2
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.models.qwen import moe_mlp

    N, D, Fm = 16, 64, 32
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    # bias experts 0 and 1 (both on device 0) hard
    router = router.at[:, 0].add(8.0).at[:, 1].add(8.0)
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5

    ref = moe_mlp(h, router, wg, wu, wd, top_k, False, layer=0)
    mesh = _mesh(ep)

    @jax.jit
    def run(h, router, wg, wu, wd):
        def fn(h, router, wg, wu, wd):
            return ep_moe_layer(h, router, wg[0], wu[0], wd[0], top_k, False,
                                "ep")
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("ep", None), P(None, None), P(None, "ep", None, None),
                      P(None, "ep", None, None), P(None, "ep", None, None)),
            out_specs=P("ep", None))(h, router, wg, wu, wd)

    got = run(h, router, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_moe_quantized_experts():
    """EP routing over QUANTIZED expert shards: the Pallas grouped dequant
    kernel (interpret mode) inside shard_map, vs the dequant oracle."""
    import qwen_inference_engine_tpu.ops.grouped_matmul as gm
    from qwen_inference_engine_tpu.models.qwen import moe_mlp
    from qwen_inference_engine_tpu.ops.linear import Linear
    from qwen_inference_engine_tpu.quant.quantize import quantize_linear

    ep, E, top_k = 2, 4, 2
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    N, D, Fm = 16, 256, 128
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(ep * N, D)).astype(np.float32))
    router = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wu = jnp.asarray(rng.normal(size=(1, E, D, Fm)).astype(np.float32)) * D ** -0.5
    wd = jnp.asarray(rng.normal(size=(1, E, Fm, D)).astype(np.float32)) * Fm ** -0.5
    qg = quantize_linear(Linear(w=wg), 8, 128)
    qu = quantize_linear(Linear(w=wu), 8, 128)
    qd = quantize_linear(Linear(w=wd), 8, 128)

    # oracle: single-device quantized moe (xla fallback)
    ref = moe_mlp(h, router, qg, qu, qd, top_k, True, layer=0,
                  use_pallas=False)

    mesh = _mesh(ep)
    import dataclasses

    def shard_q(q):  # expert axis is dim 1 of q/scales
        return dataclasses.replace(
            q, q=jax.device_put(q.q, NamedSharding(mesh, P(None, "ep", None, None))),
            scales=jax.device_put(q.scales,
                                  NamedSharding(mesh, P(None, "ep", None, None))))

    qg_s, qu_s, qd_s = map(shard_q, (qg, qu, qd))

    from tests.helpers import interpret_pallas

    def run(h, router, qg, qu, qd):
        def fn(h, router, qg, qu, qd):
            import dataclasses as dc
            mk = lambda q: dc.replace(q, q=q.q[0], scales=q.scales[0])
            return ep_moe_layer(h, router, mk(qg), mk(qu), mk(qd), top_k,
                                True, "ep", use_quant_kernel=True)
        qspec = dataclasses.replace(
            qg, q=P(None, "ep", None, None), scales=P(None, "ep", None, None))
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("ep", None), P(None, None), qspec, qspec, qspec),
            out_specs=P("ep", None),
            check_vma=False)(h, router, qg, qu, qd)

    with interpret_pallas(gm):
        got = jax.jit(run)(h, router, qg_s, qu_s, qd_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_full_forward_dp_ep_matches_single_device():
    """The WHOLE decode step under shard_map with tokens data-sharded and
    experts device-sharded (forward_hidden(ep_axis=...)): attention and
    dense projections local per shard, MoE through the all-to-all — the
    MoE analogue of the TP step, greedy-exact vs single device."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import (
        compute_logits,
        decode_step,
        forward_hidden,
        init_params,
        prefill,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    B, T, steps = ep * 2, 6, 3
    rng = np.random.default_rng(2)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)

    def mk_cache():
        return KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                              cfg.head_dim, dtype=jnp.float32)

    # single-device reference
    cache = mk_cache()
    logits, cache = prefill(params, cfg, prompts, lens, cache)
    ref, tok = [logits], jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(steps):
        logits, cache = decode_step(params, cfg, tok, lens + s, cache)
        ref.append(logits)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)

    # DP x EP: batch sharded, experts sharded, everything else replicated
    mesh = _mesh(ep)
    lspec = {}
    for name, leaf in params["layers"].items():
        if name in ("moe_gate", "moe_up", "moe_down"):
            lspec[name] = P(None, "ep", None, None)
        else:
            lspec[name] = jax.tree.map(lambda _: P(*([None] * _.ndim)), leaf)
    pspec = {k: (lspec if k == "layers" else
                 jax.tree.map(lambda _: P(*([None] * _.ndim)), v))
             for k, v in params.items()}
    cspec = KVCache(k=P(None, "ep", None, None, None),
                    v=P(None, "ep", None, None, None),
                    k_scale=None, v_scale=None)

    def body(params_l, toks_l, positions_l, cache_l, fresh):
        hidden, cache_l = forward_hidden(
            params_l, cfg, toks_l, positions_l, cache_l,
            fresh_prefill=fresh, use_pallas=False, ep_axis="ep")
        return compute_logits(params_l, hidden[:, -1], False), cache_l

    def make(fresh, T_):
        return jax.jit(jax.shard_map(
            lambda p, t, q, c: body(p, t, q, c, fresh),
            mesh=mesh,
            in_specs=(pspec, P("ep", None), P("ep", None), cspec),
            out_specs=(P("ep", None), cspec),
            check_vma=False))

    cache_s = jax.device_put(
        mk_cache(), jax.tree.map(
            lambda sp: jax.sharding.NamedSharding(mesh, sp), cspec,
            is_leaf=lambda x: isinstance(x, P)))
    params_s = jax.tree.map(
        lambda leaf, sp: leaf if leaf is None else jax.device_put(
            leaf, jax.sharding.NamedSharding(mesh, sp)),
        params, pspec, is_leaf=lambda x: x is None)

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    pre = make(True, T)
    logits, cache_s = pre(params_s, prompts, positions, cache_s)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)
    dec = make(False, 1)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(steps):
        logits, cache_s = dec(params_s, tok[:, None], (lens + s)[:, None],
                              cache_s)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref[s + 1]),
                                   rtol=2e-4, atol=2e-4, err_msg=f"step {s}")
        tok = jnp.argmax(logits, -1).astype(jnp.int32)


def test_scheduler_ep_serving_matches_single_device():
    """Continuous-batching SERVING on an expert-parallel mesh
    (parallel/ep_step.py): slots sharded over the ep axis, experts
    sharded, paged pool replicated-divergent. Greedy outputs must be
    token-identical to the single-device scheduler (VERDICT r3 #6 —
    the EP serving surface)."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    prompts = {0: [5, 9, 17, 3], 1: list(range(30, 44)), 2: [7, 8, 9],
               3: [100, 200, 300, 400, 250]}

    def run(mesh, p):
        cb = ContinuousBatchingEngine(
            cfg, p, mesh=mesh, max_slots=4, page_size=8, num_pages=64,
            max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
            prefix_cache=False)
        if mesh is not None:
            assert cb._ep_step, "EP serving path did not engage"
        for rid, pr in prompts.items():
            cb.submit(Request(request_id=rid, prompt=pr, max_new_tokens=6))
        out = {f.request_id: f.token_ids for f in cb.run_to_completion()}
        cb.check_page_invariants()
        return out

    ref = run(None, params)
    mesh = make_ep_mesh(ep)
    got = run(mesh, shard_for_ep(params, mesh))
    assert got == ref, (got, ref)


def test_scheduler_ep_serving_speculative_matches_plain():
    """PLD speculation under the EP mesh (make_ep_verify_fn): greedy
    outputs must be token-identical to the non-speculative single-device
    scheduler, and at least one slot must accept drafts (the repetitive
    prompt guarantees prompt-lookup hits)."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    rep = [11, 12, 13, 14] * 5                    # PLD-friendly
    prompts = {0: rep, 1: [7, 8, 9], 2: list(range(40, 52)), 3: rep[:12]}

    def run(mesh, p, speculative):
        cb = ContinuousBatchingEngine(
            cfg, p, mesh=mesh, max_slots=4, page_size=8, num_pages=64,
            max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
            prefix_cache=False, speculative=speculative, spec_k=3)
        if mesh is not None:
            assert cb._ep_step, "EP serving path did not engage"
        for rid, pr in prompts.items():
            cb.submit(Request(request_id=rid, prompt=pr, max_new_tokens=8))
        out = {f.request_id: f.token_ids for f in cb.run_to_completion()}
        cb.check_page_invariants()
        snap = cb.metrics.snapshot()
        return out, snap

    ref, _ = run(None, params, False)
    mesh = make_ep_mesh(ep)
    got, snap = run(mesh, shard_for_ep(params, mesh), True)
    assert got == ref, (got, ref)
    # speculation actually ran (rounds observed) and the repetitive rows
    # accepted drafts (>1 token per verify forward on average)
    assert snap["spec_rounds"] > 0
    assert snap["spec_tokens_per_forward"] > 1.0, snap


def test_scheduler_ep_batched_prefill_matches_single_device():
    """Interior prefill pieces batched one-per-shard under the EP mesh
    (make_ep_prefill_batch_fn): long prompts admitted concurrently must
    produce token-identical greedy output to the single-device scheduler,
    and the batched path must actually engage."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    # all prompts LONGER than prefill_chunk=8 -> interior pieces exist
    # on all four slots concurrently
    prompts = {i: [(7 * i + j) % 300 + 1 for j in range(21 + 3 * i)]
               for i in range(4)}

    def run(mesh, p):
        cb = ContinuousBatchingEngine(
            cfg, p, mesh=mesh, max_slots=4, page_size=8, num_pages=96,
            max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
            prefix_cache=False, prefill_chunk=8)
        for rid, pr in prompts.items():
            cb.submit(Request(request_id=rid, prompt=pr, max_new_tokens=5))
        out = {f.request_id: f.token_ids for f in cb.run_to_completion()}
        cb.check_page_invariants()
        used_batch = any(k[0] == "ep_piece_batch" for k in cb._jit_cache)
        return out, used_batch

    ref, _ = run(None, params)
    mesh = make_ep_mesh(ep)
    got, used_batch = run(mesh, shard_for_ep(params, mesh))
    assert used_batch, "batched EP prefill path did not engage"
    assert got == ref, (got, ref)


def test_scheduler_ep_draft_model_spec_matches_single_device():
    """DRAFT-MODEL speculation under the EP mesh (make_ep_spec_model_fn):
    a DENSE drafter's chain runs per-shard inside the same shard_map
    round as the MoE target's verify forward (slots sharded over ep, the
    drafter entirely local per shard). Greedy outputs must be
    token-identical to the single-device non-speculative scheduler —
    speculation is exact regardless of drafter quality — and the
    draft-model path must actually engage (closes ROADMAP #8's remaining
    PLD downgrade)."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        Request,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    dcfg = tiny_config(num_layers=1, hidden_size=64, num_heads=2,
                       num_kv_heads=2, head_dim=16)   # dense drafter
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    dparams = init_params(dcfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    greedy = SamplingParams(greedy=True)
    prompts = {0: [5, 9, 17, 3] * 3, 1: [7, 8, 9], 2: list(range(40, 52)),
               3: [100, 200, 300, 400]}

    def run(mesh, p, dp):
        cb = ContinuousBatchingEngine(
            cfg, p, mesh=mesh, max_slots=4, page_size=8, num_pages=64,
            max_pages_per_seq=8, sampling=greedy, kv_dtype=jnp.float32,
            prefix_cache=False, speculative=dp is not None, spec_k=3,
            draft_params=dp, draft_cfg=dcfg if dp is not None else None)
        if mesh is not None:
            assert cb._ep_step, "EP serving path did not engage"
            assert cb._model_draft, "EP draft-model path did not engage"
        for rid, pr in prompts.items():
            cb.submit(Request(request_id=rid, prompt=pr, max_new_tokens=8))
        out = {f.request_id: f.token_ids for f in cb.run_to_completion()}
        cb.check_page_invariants()
        return out, cb.metrics.snapshot()

    ref, _ = run(None, params, None)
    mesh = make_ep_mesh(ep)
    got, snap = run(mesh, shard_for_ep(params, mesh),
                    shard_for_ep(dparams, mesh))
    assert got == ref, (got, ref)
    assert snap["spec_rounds"] > 0


def test_scheduler_ep_moe_draft_model_downgrades_to_pld():
    """An MoE DRAFTER under the EP mesh has no all-to-all plumbing:
    construction must warn and downgrade to prompt-lookup drafts rather
    than engage the model-draft path."""
    ep = 4
    if len(jax.devices()) < ep:
        pytest.skip("needs virtual device mesh")
    import warnings as _w

    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams
    from qwen_inference_engine_tpu.parallel.ep_step import (
        make_ep_mesh,
        shard_for_ep,
    )

    cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    mesh = make_ep_mesh(ep)
    ps = shard_for_ep(params, mesh)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cb = ContinuousBatchingEngine(
            cfg, ps, mesh=mesh, max_slots=4, page_size=8, num_pages=64,
            max_pages_per_seq=8, sampling=SamplingParams(greedy=True),
            kv_dtype=jnp.float32, prefix_cache=False, speculative=True,
            spec_k=3, draft_params=ps, draft_cfg=cfg)
    assert not cb._model_draft
    assert any("MoE draft models" in str(w.message) for w in rec)
