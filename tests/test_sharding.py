"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh.

The multi-host strategy SURVEY.md §2c/§5.8 requires, validated the TPU way:
identical greedy outputs between unsharded, TP=8, and DP×TP=2×4 runs prove
the NamedSharding specs + GSPMD collectives preserve the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.engine.engine import Engine
from qwen_inference_engine_tpu.models.qwen import init_params
from qwen_inference_engine_tpu.ops.sampling import SamplingParams
from qwen_inference_engine_tpu.parallel.mesh import make_mesh
from qwen_inference_engine_tpu.parallel.sharding import param_pspecs, shard_params
from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_params

# dims divisible by 8 so every TP spec applies cleanly
CFG = tiny_config(vocab_size=512, hidden_size=128, intermediate_size=256,
                  num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16)
GREEDY = SamplingParams(greedy=True)
PROMPTS = [[5, 9, 17, 3], [100, 200, 300, 400, 500, 42]]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def baseline(params):
    eng = Engine(CFG, params, max_batch=2, max_seq=64, sampling=GREEDY,
                 kv_dtype=jnp.float32)
    return eng.generate(PROMPTS, max_new_tokens=6).token_ids


def test_param_pspecs_cover_tree(params):
    specs = param_pspecs(params)
    pl, sl = jax.tree.flatten(params)[1], jax.tree.flatten(specs)[1]
    assert pl == sl  # identical treedef → every leaf has a spec


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)], ids=["tp8", "dp2tp4"])
def test_sharded_generation_matches_unsharded(params, baseline, shape, devices8):
    mesh = make_mesh(shape, devices=devices8)
    sharded = shard_params(params, mesh)
    eng = Engine(CFG, sharded, mesh=mesh, max_batch=2, max_seq=64,
                 sampling=GREEDY, kv_dtype=jnp.float32)
    out = eng.generate(PROMPTS, max_new_tokens=6).token_ids
    assert out == baseline


def test_sharded_quantized_generation(params, devices8):
    """INT8-quantized params under TP=8 still generate (specs cover
    QuantLinear: packed weights + scales)."""
    mesh = make_mesh((1, 8), devices=devices8)
    qparams = quantize_params(params, QuantConfig(bits=8))
    sharded = shard_params(qparams, mesh)
    eng = Engine(CFG, sharded, mesh=mesh, max_batch=2, max_seq=64,
                 sampling=GREEDY, kv_dtype=jnp.float32)
    out = eng.generate(PROMPTS, max_new_tokens=4).token_ids
    ref_eng = Engine(CFG, qparams, max_batch=2, max_seq=64, sampling=GREEDY,
                     kv_dtype=jnp.float32)
    ref = ref_eng.generate(PROMPTS, max_new_tokens=4).token_ids
    assert out == ref


def test_kv_head_fallback_sharding(devices8):
    """num_kv_heads=2 < mesh model size 8 → cache shards over head_dim;
    generation must still match unsharded."""
    cfg = tiny_config(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=8, num_kv_heads=2, head_dim=16)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = Engine(cfg, params, max_batch=1, max_seq=64, sampling=GREEDY,
                 kv_dtype=jnp.float32).generate([[3, 1, 4]], max_new_tokens=4).token_ids
    mesh = make_mesh((1, 8), devices=devices8)
    eng = Engine(cfg, shard_params(params, mesh), mesh=mesh, max_batch=1,
                 max_seq=64, sampling=GREEDY, kv_dtype=jnp.float32)
    out = eng.generate([[3, 1, 4]], max_new_tokens=4).token_ids
    assert out == ref


def test_moe_expert_parallel_generation_matches_unsharded(devices8):
    """Qwen3-MoE under the (1,8) mesh: experts shard over the model axis
    (expert parallelism via GSPMD); greedy output must match unsharded."""
    cfg = tiny_config(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16,
                      qk_norm=True).replace(
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64)
    from qwen_inference_engine_tpu.models.qwen import init_params as ip

    params = ip(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    ref = Engine(cfg, params, max_batch=2, max_seq=64, sampling=GREEDY,
                 kv_dtype=jnp.float32).generate(PROMPTS, max_new_tokens=5).token_ids
    mesh = make_mesh((1, 8), devices=devices8)
    eng = Engine(cfg, shard_params(params, mesh), mesh=mesh, max_batch=2,
                 max_seq=64, sampling=GREEDY, kv_dtype=jnp.float32)
    out = eng.generate(PROMPTS, max_new_tokens=5).token_ids
    assert out == ref


def test_sequence_sharded_prefill_matches_unsharded(devices8):
    """Sequence parallelism via GSPMD: the prompt's TOKEN axis sharded
    over the model axis (long-context prefill splits the sequence across
    chips; XLA inserts the gathers causal attention needs). Logits must
    match the unsharded prefill."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import prefill

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 2, 32
    rng = np.random.default_rng(5)
    prompts = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)

    cache = KVCache.create(CFG.num_layers, B, 64, CFG.num_kv_heads,
                           CFG.head_dim, dtype=jnp.float32)
    ref, _ = prefill(params, CFG, prompts, lens, cache)

    mesh = make_mesh((1, 8), devices=devices8)
    sharded = shard_params(params, mesh)
    toks_s = jax.device_put(prompts, NamedSharding(mesh, P(None, "model")))
    cache_s = KVCache.create(CFG.num_layers, B, 64, CFG.num_kv_heads,
                             CFG.head_dim, dtype=jnp.float32)
    from qwen_inference_engine_tpu.parallel.sharding import make_sharded_cache

    cache_s = make_sharded_cache(cache_s, mesh)
    with mesh:
        got, _ = jax.jit(lambda p, t, l, c: prefill(p, CFG, t, l, c))(
            sharded, toks_s, lens, cache_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
