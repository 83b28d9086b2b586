"""Profile non-matmul decode components at a given batch."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.ops.attention import gqa_attention
from qwen_inference_engine_tpu.kvcache.cache import contiguous_write
from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample
from qwen_inference_engine_tpu.ops.norms import rms_norm
from qwen_inference_engine_tpu.ops.rope import apply_rope, precompute_rope

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 272
L, D, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
key = jax.random.PRNGKey(0)

kc = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)
vc = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)
pos = jnp.full((B, 1), S - 8, jnp.int32)
kv_gb = 2 * kc.size * 2 / 1e9

mk = lambda n: jax.random.normal(key, (n, B, 1, Hq, Dh), jnp.bfloat16)
us = marginal_us(lambda w, x: gqa_attention(x, w[0], w[1], pos), (kc, vc), mk)
print(f"attn decode (xla gqa) B{B} S{S}: {us:8.1f} us "
      f"({kv_gb/(us*1e-6):.0f} GB/s) -> x{L} = {us*L/1e3:.2f} ms")

mk = lambda n: jax.random.normal(key, (n, B, 1, Hk, Dh), jnp.bfloat16)
us = marginal_us(lambda w, x: contiguous_write(w, x, pos, False), kc, mk)
print(f"kv write: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")

sp = SamplingParams(temperature=0.7, top_k=50)
mk = lambda n: jax.random.normal(key, (n, B, V), jnp.float32)
us = marginal_us(lambda w, x: sample(x, w, sp), key, mk)
print(f"sampling top{sp.top_k} B{B} V{V}: {us:8.1f} us")

w = jnp.ones((D,), jnp.bfloat16)
mk = lambda n: jax.random.normal(key, (n, B, 1, D), jnp.bfloat16)
us = marginal_us(lambda w_, x: rms_norm(x, w_, 1e-6), w, mk)
print(f"rms_norm B{B}: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")

cos, sin = precompute_rope(2048, Dh, cfg.rope_theta)
p1 = jnp.full((B, 1), S - 8, jnp.int32)
mk = lambda n: jax.random.normal(key, (n, B, 1, Hq, Dh), jnp.bfloat16)
us = marginal_us(lambda w, x: apply_rope(x, p1, w[0], w[1]), (cos, sin), mk)
print(f"rope q B{B}: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")
