"""Ablate the real decode_step at the step level (scan of steps in one jit).

Monkeypatches components out of models/qwen.py to attribute in-graph time.
Usage: PYTHONPATH=. python scripts/ablate_decode.py [batch] [max_seq]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
import qwen_inference_engine_tpu.models.qwen as qw

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 272
key = jax.random.PRNGKey(0)
params = qw.init_quantized_params(cfg, key, bits=4, group_size=256,
                                  quantize_lm_head=True)
cache0 = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim)
jax.block_until_ready(params)

N_STEPS = 12


def run_steps(label):
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample
    sp = SamplingParams(temperature=0.7, top_k=50, approx_top_k=True)

    @jax.jit
    def many(params, cache):
        def step(carry, i):
            tok, cache = carry
            pos = jnp.full((B,), 200, jnp.int32) + i
            logits, cache = qw.decode_step(params, cfg, tok, pos, cache, uniform_decode=True)
            tok = sample(logits, jax.random.fold_in(key, i), sp)
            return (tok, cache), None

        (tok, cache), _ = jax.lax.scan(
            step, (jnp.zeros((B,), jnp.int32), cache), jnp.arange(N_STEPS))
        return tok

    r = many(params, cache0)
    np.asarray(r)

    def timed(reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(params, cache0)
        np.asarray(r)
        return time.perf_counter() - t0

    t_lo = timed(2)
    t_hi = timed(8)
    ms = (t_hi - t_lo) / (6 * N_STEPS) * 1e3
    print(f"{label:36s}: {ms:7.2f} ms/step")
    return ms


base = run_steps("full decode step")

# ablate attention
orig_gqa = qw.gqa_attention
qw.gqa_attention = lambda q, k, v, pos, **kw: q
no_attn = run_steps("attention -> identity")
qw.gqa_attention = orig_gqa

# ablate norms
orig_rms, orig_qk = qw.rms_norm, qw.qk_norm
qw.rms_norm = lambda x, w, eps: x
no_norm = run_steps("rms_norm -> identity")
qw.rms_norm = orig_rms

# ablate rope
orig_rope = qw.apply_rope
qw.apply_rope = lambda x, pos, cos, sin: x
no_rope = run_steps("rope -> identity")
qw.apply_rope = orig_rope

# ablate kv writes
orig_wr = qw._write_cache_stacked
qw._write_cache_stacked = lambda c, l, k, v, p, bt, ps, fp: c
no_kvw = run_steps("kv write -> skip")
qw._write_cache_stacked = orig_wr

# ablate sampling + lm_head: decode hidden only
orig_logits = qw.compute_logits
qw.compute_logits = lambda p, h, up=True: jnp.zeros(
    (h.shape[0], 128), jnp.float32) + h[:, :1]
no_lm = run_steps("lm_head+sampling -> stub")
qw.compute_logits = orig_logits

print(f"\nattention   : {base-no_attn:6.2f} ms")
print(f"norms       : {base-no_norm:6.2f} ms")
print(f"rope        : {base-no_rope:6.2f} ms")
print(f"kv writes   : {base-no_kvw:6.2f} ms")
print(f"lm+sampling : {base-no_lm:6.2f} ms")

# deeper: skip cache READ too (attention -> q, no slice)
import qwen_inference_engine_tpu.models.qwen as qw2
orig_read = qw.gqa_attention_kmajor
orig_gqa2 = qw.gqa_attention


def fake_forward_read(cslices, block_tables, page_size, dtype):
    return None, None


orig_rl = qw._read_layer_cache
qw._read_layer_cache = fake_forward_read
qw.gqa_attention_kmajor = lambda q, k, v, pos, **kw: q
no_read = run_steps("cache read+attn -> skip")
qw._read_layer_cache = orig_rl
qw.gqa_attention_kmajor = orig_read

# write via uniform-position DUS (single dynamic_update_slice per array)
def uniform_write(cache_c, layer, k_new, v_new, positions, block_tables,
                  page_size, fresh_prefill):
    out = dict(cache_c)
    pos0 = positions[0, 0]
    def wr(arr, new):
        new_km = new.swapaxes(1, 2)[None].astype(arr.dtype)  # [1,B,Hk,T,...]
        starts = (layer, 0, 0, pos0) + (0,) * (arr.ndim - 4)
        return jax.lax.dynamic_update_slice(arr, new_km, starts)
    out["k"] = wr(cache_c["k"], k_new)
    out["v"] = wr(cache_c["v"], v_new)
    return out


qw._write_cache_stacked = uniform_write
uni = run_steps("kv write -> uniform DUS")
qw._write_cache_stacked = orig_wr

print(f"cache read  : {no_attn-no_read:6.2f} ms (incremental over no-attn)")
print(f"scatter vs DUS write: {base-uni:6.2f} ms")

# ablate the NEW kernels (contig decode attention + uniform append)
import qwen_inference_engine_tpu.ops.decode_attention as da_mod
import qwen_inference_engine_tpu.ops.kv_append as ka_mod

orig_da = da_mod.decode_attention_contiguous
da_mod.decode_attention_contiguous = \
    lambda q, kc, vc, l, lens, scale=None, row0=0: q
no_da = run_steps("contig attn kernel -> identity")
da_mod.decode_attention_contiguous = orig_da

orig_ka = ka_mod.kv_append_uniform
ka_mod.kv_append_uniform = lambda kc, vc, kn, vn, p, l, row0=0: (kc, vc)
no_ka = run_steps("uniform append -> skip")
ka_mod.kv_append_uniform = orig_ka

print(f"contig attn kernel : {base-no_da:6.2f} ms")
print(f"uniform append     : {base-no_ka:6.2f} ms")

# ablate ALL linear matmuls (weights never touched)
from qwen_inference_engine_tpu.ops import linear as lin_mod

orig_apply = lin_mod.apply_linear


def fake_apply(x, lin, use_pallas=True, layer=None):
    out = lin.out_features if hasattr(lin, "out_features") else lin.w.shape[-1]
    return jnp.zeros((*x.shape[:-1], out), x.dtype) + x[..., :1]


lin_mod.apply_linear = fake_apply
qw.apply_linear = fake_apply
no_mm = run_steps("all linears -> stub")
lin_mod.apply_linear = orig_apply
qw.apply_linear = orig_apply
print(f"linears (in-graph) : {base-no_mm:6.2f} ms")
