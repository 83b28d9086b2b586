"""Break down decode-step time: per-shape quant matmuls, attention, sampling.

Uses scripts/tpu_timing.marginal_us (value-fetch sync + reps differencing;
block_until_ready returns early through this tunnel).

Usage: PYTHONPATH=. python scripts/profile_decode.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.ops.linear import QuantLinear
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
L, D, F, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
Qd, Kd = cfg.q_dim, cfg.kv_dim
GS = 256
key = jax.random.PRNGKey(0)


def mk_qlin(kin, out, bits=4):
    pack = 2 if bits == 4 else 1
    q = jax.random.randint(key, (kin // pack, out), -128, 128, dtype=jnp.int8)
    scales = jnp.full((kin // GS, out), (kin ** -0.5) / 7, jnp.float32)
    return QuantLinear(q=q, scales=scales, b=None, bits=bits, group_size=GS)




shapes = [("q", D, Qd), ("k", D, Kd), ("v", D, Kd), ("o", Qd, D),
          ("gate", D, F), ("up", D, F), ("down", F, D)]
total_mm = 0.0
for name, kin, out in shapes:
    lin = mk_qlin(kin, out)
    mk = lambda n: jax.random.normal(key, (n, B, kin), jnp.bfloat16)
    us = marginal_us(lambda w, x: quant_matmul_pallas(x, w), lin, mk)
    nbytes = lin.q.size + lin.scales.size * 4
    gbs = nbytes / (us * 1e-6) / 1e9
    total_mm += us
    print(f"{name:5s} [{B}x{kin}]x[{kin}x{out}] int4: {us:8.1f} us  {gbs:6.0f} GB/s")
print(f"per-layer matmul total: {total_mm:.1f} us -> x{L} layers = {total_mm*L/1e3:.2f} ms")

lm = mk_qlin(D, V)
mk = lambda n: jax.random.normal(key, (n, B, D), jnp.bfloat16)
us = marginal_us(lambda w, x: quant_matmul_pallas(x, w), lm, mk)
print(f"lm_head [{B}x{D}]x[{D}x{V}] int4: {us:8.1f} us "
      f"({(lm.q.size + lm.scales.size*4)/(us*1e-6)/1e9:.0f} GB/s)")
lm_us = us

# attention decode: contiguous bf16 cache read + gqa
from qwen_inference_engine_tpu.ops.attention import gqa_attention

S = 272
Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
kc = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)
vc = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)
pos = jnp.full((B, 1), 200, jnp.int32)
qs = jax.random.normal(key, (ITERS, B, 1, Hq, Dh), jnp.bfloat16)
us = bench_scanned(lambda w, x: gqa_attention(x, w[0], w[1], pos), (kc, vc), qs)
kv_gb = 2 * kc.size * 2 / 1e9
print(f"attn decode (xla gqa) B{B} S{S}: {us:8.1f} us "
      f"({kv_gb/(us*1e-6):.0f} GB/s) -> x{L} = {us*L/1e3:.2f} ms")
attn_us = us

# KV write (contiguous)
from qwen_inference_engine_tpu.kvcache.cache import contiguous_write

mk = lambda n: jax.random.normal(key, (n, B, 1, Hk, Dh), jnp.bfloat16)
us = marginal_us(lambda w, x: contiguous_write(w, x, pos, False), kc, mk)
print(f"kv write: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")
kvw_us = us

# sampling
from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample

sp = SamplingParams(temperature=0.7, top_k=50)
mk = lambda n: jax.random.normal(key, (n, B, V), jnp.float32)
us = marginal_us(lambda w, x: sample(x, w, sp), key, mk)
print(f"sampling top{sp.top_k} B{B} V{V}: {us:8.1f} us")
samp_us = us

# small per-layer ops: rmsnorm x2, rope, qk-embed etc -> measure rms_norm
from qwen_inference_engine_tpu.ops.norms import rms_norm

w = jnp.ones((D,), jnp.bfloat16)
mk = lambda n: jax.random.normal(key, (n, B, 1, D), jnp.bfloat16)
us = marginal_us(lambda w, x: rms_norm(x, w, 1e-6), w, mk)
print(f"rms_norm B{B}: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")

est = (total_mm * L + lm_us + attn_us * L + kvw_us * 2 * L + samp_us) / 1e3
print(f"\nestimated step from parts: {est:.2f} ms")
