"""Step-level ablation of the CURRENT (Pallas) decode path.

Times a scan of real decode_steps, then monkeypatches one component to
identity and re-times: the delta is that component's in-graph cost.
Usage: python scripts/ablate_decode2.py [batch] [max_seq] [variant...]
Variants: base attn lm qkvfuse
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
import qwen_inference_engine_tpu.models.qwen as qw
import qwen_inference_engine_tpu.ops.decode_attention as da

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
variants = sys.argv[3:] or ["base", "attn", "lm"]
key = jax.random.PRNGKey(0)
params = qw.init_quantized_params(cfg, key, bits=4, group_size=256,
                                  quantize_lm_head=True)
jax.block_until_ready(params)

N_STEPS = 12
P0 = S - N_STEPS - 4


def run_steps(label, p=None):
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample
    sp = SamplingParams(temperature=0.7, top_k=50, approx_top_k=True)
    p = params if p is None else p

    @jax.jit
    def many(params):
        # cache built in-graph: passing it as an undonated arg would
        # double the 8+ GB allocation
        cache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads,
                               cfg.head_dim)

        def step(carry, i):
            tok, cache = carry
            pos = jnp.full((B,), P0, jnp.int32) + i
            logits, cache = qw.decode_step(params, cfg, tok, pos, cache,
                                           uniform_decode=True)
            tok = sample(logits, jax.random.fold_in(key, i), sp)
            return (tok, cache), None

        (tok, cache), _ = jax.lax.scan(
            step, (jnp.zeros((B,), jnp.int32), cache), jnp.arange(N_STEPS))
        return tok

    r = many(p)
    np.asarray(r)

    def timed(reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(p)
        np.asarray(r)
        return time.perf_counter() - t0

    t_lo = timed(2)
    t_hi = timed(8)
    ms = (t_hi - t_lo) / (6 * N_STEPS) * 1e3
    print(f"{label:40s}: {ms:7.2f} ms/step", flush=True)
    return ms


base = run_steps("full decode step (append-fused attn)")

if "attn" in variants:
    orig = da.decode_attention_appending
    da.decode_attention_appending = \
        lambda q, kc, vc, kn, vn, l, pos, **kw: (q, kc, vc)
    no_attn = run_steps("attention+append -> identity")
    da.decode_attention_appending = orig
    print(f"  attention+append cost: {base - no_attn:6.2f} ms")

if "oldattn" in variants:
    # old split path: tile-RMW append + separate attention kernel
    orig = da.decode_attention_appending
    from qwen_inference_engine_tpu.ops.kv_append import kv_append_uniform

    def split_path(q, kc, vc, kn, vn, l, pos, scale=None):
        kc, vc = kv_append_uniform(kc, vc, kn, vn, pos, l)
        lens = jnp.full((q.shape[0],), pos + 1, jnp.int32)
        return da.decode_attention_contiguous(q, kc, vc, l, lens), kc, vc

    da.decode_attention_appending = split_path
    old = run_steps("split append + attention (old path)")
    da.decode_attention_appending = orig
    print(f"  append-fuse saves: {old - base:6.2f} ms")

if "lm" in variants:
    orig = qw.compute_logits
    qw.compute_logits = lambda p, h, up=True: jnp.zeros(
        (h.shape[0], 512), jnp.float32) + h[:, :1]
    no_lm = run_steps("lm_head+sampling -> stub")
    qw.compute_logits = orig
    print(f"  lm_head+sampling cost: {base - no_lm:6.2f} ms")

if "qkvfuse" in variants:
    from qwen_inference_engine_tpu.quant.quantize import fuse_projections

    fused = fuse_projections(params)
    run_steps("with fused qkv+gateup projections", p=fused)
