"""Why does the PAGED serving decode cost ~11x the contiguous bench path
at b96 x S1500 (r4 ablate_verify: 266.9 ms/tick vs bench 24.5 ms)?

Times, at the same shapes: (a) contiguous decode_step, (b) paged
decode_step via block tables, (c) the scheduler's full _jit_decode
(paged + per-row dynamic sampling + seen mask), (d) paged attention
kernel alone.

Usage: python scripts/probe_paged_decode.py [batch] [ctx]
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.models.qwen import (
    decode_step, init_quantized_params)
from qwen_inference_engine_tpu.kvcache.cache import KVCache, PagedKVCache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
PAGE = int(sys.argv[3]) if len(sys.argv) > 3 else 16
cfg = ModelConfig.from_pretrained("qwen2.5-7b")
params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                               group_size=256, quantize_lm_head=True,
                               pad_free=True)
jax.block_until_ready(params)
print(f"probe_paged_decode b{B} ctx{CTX} page{PAGE} on {jax.devices()[0].device_kind}", flush=True)

def timed(call):
    """call() must thread its own donated state and return a small out."""
    np.asarray(jax.tree.leaves(call())[0]).ravel()[:1]
    def t(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = call()
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0
    lo = min(t(4) for _ in range(2)); hi = min(t(12) for _ in range(2))
    return (hi - lo) / 8

tok = jnp.zeros((B,), jnp.int32)
pos = jnp.full((B,), CTX, jnp.int32)

# (a) contiguous int8 cache
S = -(-(CTX + 64) // 256) * 256
ccache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.int8)
f_contig = jax.jit(lambda p, t_, q, c: decode_step(p, cfg, t_, q, c,
                                                   uniform_decode=True),
                   donate_argnums=(3,))
cell = {"c": ccache}
def call_contig():
    out, cell["c"] = f_contig(params, tok, pos, cell["c"])
    return out
dt = timed(call_contig)
print(f"contiguous decode_step:        {dt*1e3:.2f} ms", flush=True)
del cell

# (b) paged decode_step
pages_per_seq = -(-(CTX + 64) // PAGE)
npages = B * pages_per_seq + 8
pcache = PagedKVCache.create(cfg.num_layers, npages, PAGE, cfg.num_kv_heads,
                             cfg.head_dim, dtype=jnp.int8)
tables = np.zeros((B, pages_per_seq), np.int32)
ids = np.arange(1, B * pages_per_seq + 1, dtype=np.int32)
tables[:] = ids.reshape(B, pages_per_seq)
tables_d = jnp.asarray(tables)
f_paged = jax.jit(lambda p, t_, q, c, bt: decode_step(p, cfg, t_, q, c,
                                                      block_tables=bt),
                  donate_argnums=(3,))
pcell = {"c": pcache}
def call_paged():
    out, pcell["c"] = f_paged(params, tok, pos, pcell["c"], tables_d)
    return out
dt = timed(call_paged)
print(f"paged decode_step:             {dt*1e3:.2f} ms", flush=True)
pcache = pcell["c"]

# (c) the scheduler's full _jit_decode on identical state
from qwen_inference_engine_tpu.engine.scheduler import ContinuousBatchingEngine
from qwen_inference_engine_tpu.ops.sampling import SamplingParams
cb = ContinuousBatchingEngine(cfg, params, max_slots=B, page_size=PAGE,
    num_pages=npages, max_pages_per_seq=pages_per_seq,
    sampling=SamplingParams(greedy=True), kv_dtype=jnp.int8,
    prefix_cache=False)
cb.cache = pcache
dec = cb._jit_decode()
sp = cb._sp_dyn_rows(); seen = cb._seen
act = jnp.ones((B,), bool)
rkey = jax.random.PRNGKey(0)
state = {}
def f_sched():
    global seen
    nxt, cb.cache, seen = dec(params, tok, pos, cb.cache, tables_d, rkey,
                              sp, seen, act)
    return nxt
dt = timed(f_sched)
print(f"scheduler _jit_decode (paged): {dt*1e3:.2f} ms", flush=True)
