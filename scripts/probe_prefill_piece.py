"""Admission-path cost: one chunked-prefill CONTINUATION piece (B=1,
T=prefill_chunk) into the paged pool, XLA gather path vs the paged
chunk-attention kernel (ops/chunk_attention.paged_chunk_attention).

The scheduler admits long prompts one piece per tick; after the append
kernel landed (r4) the remaining cost was the paged_read gather of the
whole block-table range per layer. Usage:
  python scripts/probe_prefill_piece.py [chunk] [start] [page]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import PagedKVCache
from qwen_inference_engine_tpu.models.qwen import (
    forward_hidden,
    init_quantized_params,
)

T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
START = int(sys.argv[2]) if len(sys.argv) > 2 else 1152
PAGE = int(sys.argv[3]) if len(sys.argv) > 3 else 512
KV_BITS = int(sys.argv[4]) if len(sys.argv) > 4 else 8

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                               group_size=256, quantize_lm_head=True,
                               pad_free=True)
jax.block_until_ready(params)
print(f"probe_prefill_piece T{T} start{START} page{PAGE} kv{KV_BITS} on "
      f"{jax.devices()[0].device_kind}", flush=True)

pps = -(-(START + T) // PAGE)
# serving-sized pool: the gather cost scales with the TABLE range, so use
# a realistic max_pages per sequence (32k context at page 512 = 64)
max_pages = max(pps, 2048 // PAGE * 8)
P = 4 * max_pages
dtype = jnp.int8 if KV_BITS == 8 else jnp.bfloat16
tables = jnp.asarray(
    np.random.permutation(P)[:max_pages].reshape(1, max_pages), jnp.int32)
toks = jnp.zeros((1, T), jnp.int32)
positions = START + jnp.arange(T, dtype=jnp.int32)[None, :]


def make_fn(impl):
    @jax.jit
    def f(params, toks, positions, cache_arrays):
        cache = PagedKVCache(page_size=PAGE, **cache_arrays)
        h, cache2 = forward_hidden(params, cfg, toks, positions, cache,
                                   block_tables=tables, attn_impl=impl)
        return h[:, -1, :1], {"k_pages": cache2.k_pages,
                              "v_pages": cache2.v_pages,
                              "k_scale": cache2.k_scale,
                              "v_scale": cache2.v_scale}
    return f


def timed(fn, reps=8):
    cache = PagedKVCache.create(cfg.num_layers, P, PAGE, cfg.num_kv_heads,
                                cfg.head_dim, dtype=dtype)
    arrs = {"k_pages": cache.k_pages, "v_pages": cache.v_pages,
            "k_scale": cache.k_scale, "v_scale": cache.v_scale}
    out, arrs = fn(params, toks, positions, arrs)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o, arrs = fn(params, toks, positions, arrs)
        np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


for impl in ("xla", "pallas"):
    try:
        dt = timed(make_fn(impl))
        print(f"prefill piece ({impl:6s}): {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"prefill piece ({impl}): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
