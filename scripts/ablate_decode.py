"""Ablate the real decode_step: pallas vs xla linear, attention on/off."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import decode_step, init_quantized_params

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B, S = 32, 272
key = jax.random.PRNGKey(0)
params = init_quantized_params(cfg, key, bits=4, group_size=128, quantize_lm_head=True)
cache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim)
jax.block_until_ready(params)
tok = jnp.zeros((B,), jnp.int32)
pos = jnp.full((B,), 200, jnp.int32)


def timestep(name, **kw):
    f = jax.jit(lambda p, t, q, c: decode_step(p, cfg, t, q, c, **kw)[0])
    r = f(params, tok, pos, cache)
    np.asarray(r)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        r = f(params, tok, pos, cache)
    np.asarray(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s}: {ms:7.2f} ms/step")
    return ms


timestep("full decode_step (pallas linears)", use_pallas=True)
timestep("decode_step xla linears", use_pallas=False)
timestep("decode_step pallas, attn_impl=xla", use_pallas=True, attn_impl="xla")
