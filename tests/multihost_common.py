"""Shared model-under-test for the multi-host (2-process) distributed test.

The whole forward runs inside one jit so arrays are born with global SPMD
semantics (no host-local/global conversions needed in multi-controller
mode); the return value is a fully-replicated scalar, fetchable from any
process.
"""

import jax
import jax.numpy as jnp
import numpy as np


def checksum_tp_step() -> float:
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.parallel.mesh import make_mesh
    from qwen_inference_engine_tpu.parallel.tp_step import (
        make_tp_decode_fn,
        make_tp_prefill_fn,
    )

    cfg = tiny_config(num_heads=4, num_kv_heads=4)
    mesh = make_mesh((2, 4))  # data spans processes (DCN), model inside (ICI)
    B, T, S = 4, 8, 64

    params_t = jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0), jnp.float32))
    cache_t = jax.eval_shape(
        lambda: KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads,
                               cfg.head_dim, dtype=jnp.float32))
    pre = make_tp_prefill_fn(cfg, mesh, params_t, cache_t, chunk=32)
    dec = make_tp_decode_fn(cfg, mesh, params_t, cache_t,
                            uniform_decode=True)

    @jax.jit
    def run():
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        cache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads,
                               cfg.head_dim, dtype=jnp.float32)
        toks = (jnp.arange(B * T, dtype=jnp.int32).reshape(B, T)
                % cfg.vocab_size)
        lens = jnp.full((B,), T, jnp.int32)
        logits, cache = pre(params, toks, lens, cache)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, cache = dec(params, nxt, lens, cache)
        return (jnp.sum(jnp.tanh(logits.astype(jnp.float32))) +
                jnp.sum(jnp.tanh(logits2.astype(jnp.float32))))

    return float(np.asarray(run()))
