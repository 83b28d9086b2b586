"""Break down decode-step time: per-shape quant matmuls, attention, sampling.

Each op is timed inside a single jit as a lax.scan over ITERS distinct
inputs (amortizes the ~1.3 ms host->device dispatch of this tunnel setup
and prevents CSE), weights passed as arguments (not closed-over constants).

Usage: PYTHONPATH=. python scripts/profile_decode.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.ops.linear import QuantLinear
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
B = 32
L, D, F, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
Qd, Kd = cfg.q_dim, cfg.kv_dim
GS = 128
ITERS = 20
key = jax.random.PRNGKey(0)


def mk_qlin(kin, out, bits=4):
    pack = 2 if bits == 4 else 1
    q = jax.random.randint(key, (kin // pack, out), -7, 8, dtype=jnp.int8)
    scales = jnp.full((kin // GS, out), (kin ** -0.5) / 7, jnp.float32)
    return QuantLinear(q=q, scales=scales, b=None, bits=bits, group_size=GS)


def bench_scanned(op, weights, xs, n_timing=5):
    """op(w, x) scanned over xs[0..ITERS); returns us per op call."""
    def body(acc, x):
        y = op(weights, x)
        return acc + jnp.sum(y.astype(jnp.float32)), None

    @jax.jit
    def run(w, xs):
        acc, _ = jax.lax.scan(lambda a, x: body(a, x), jnp.float32(0), xs)
        return acc

    r = run(weights, xs)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(n_timing):
        r = run(weights, xs)
    np.asarray(r)
    dt = time.perf_counter() - t0
    return dt / (n_timing * ITERS) * 1e6  # us per call


shapes = [("q", D, Qd), ("k", D, Kd), ("v", D, Kd), ("o", Qd, D),
          ("gate", D, F), ("up", D, F), ("down", F, D)]
total_mm = 0.0
for name, kin, out in shapes:
    lin = mk_qlin(kin, out)
    xs = jax.random.normal(key, (ITERS, B, kin), jnp.bfloat16)
    us = bench_scanned(lambda w, x: quant_matmul_pallas(x, w), lin, xs)
    nbytes = lin.q.size + lin.scales.size * 4
    gbs = nbytes / (us * 1e-6) / 1e9
    total_mm += us
    print(f"{name:5s} [{B}x{kin}]x[{kin}x{out}] int4: {us:8.1f} us  {gbs:6.0f} GB/s")
print(f"per-layer matmul total: {total_mm:.1f} us -> x{L} layers = {total_mm*L/1e3:.2f} ms")

lm = mk_qlin(D, V)
xs = jax.random.normal(key, (ITERS, B, D), jnp.bfloat16)
us = bench_scanned(lambda w, x: quant_matmul_pallas(x, w), lm, xs)
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

kn = jax.random.normal(key, (ITERS, B, 1, Hk, Dh), jnp.bfloat16)
us = bench_scanned(lambda w, x: contiguous_write(w, x, pos, False), kc, kn)
print(f"kv write: {us:8.1f} us -> x{2*L} = {us*2*L/1e3:.2f} ms")
kvw_us = us

# sampling
from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample

sp = SamplingParams(temperature=0.7, top_k=50)
ls = jax.random.normal(key, (ITERS, B, V), jnp.float32)
us = bench_scanned(lambda w, x: sample(x, w, sp), key, ls)
print(f"sampling top{sp.top_k} B{B} V{V}: {us:8.1f} us")
samp_us = us

est = (total_mm * L + lm_us + attn_us * L + kvw_us * 2 * L + samp_us) / 1e3
print(f"\nestimated step from parts: {est:.2f} ms (bench measured ~20 ms)")
