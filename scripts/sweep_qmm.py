"""Empirical block-size sweep for the Pallas quant matmul on real TPU.

Run: python scripts/sweep_qmm.py [bits] — prints GB/s of weight-read per
(block_k, block_n) for the Qwen2.5-7B gate projection shape.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.ops.linear import Linear, _quant_matmul_xla
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas
from qwen_inference_engine_tpu.quant.quantize import quantize_linear

BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
M, K, N = 16, 3584, 18944
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.03)
x0 = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
qlin = quantize_linear(Linear(w), BITS, 128)
qbytes = qlin.q.size + qlin.scales.size * 4
y_ref = np.asarray(_quant_matmul_xla(x0.astype(jnp.float32), qlin), np.float32)

pair = 256 if BITS == 4 else 128
bks = [bk for bk in (256, 512, 896, 1792, 3584) if K % bk == 0 and bk % pair == 0]
bns = [bn for bn in (512, 1024, 2048, 4736, 9472) if N % bn == 0 and bn % 128 == 0]

for bk in bks:
    for bn in bns:
        try:
            f = jax.jit(lambda x: quant_matmul_pallas(
                x, qlin, block_override=(bk, bn)).astype(jnp.float32).sum() * 1e-6)
            v = float(f(x0))
            # correctness spot check once
            y = np.asarray(quant_matmul_pallas(x0, qlin, block_override=(bk, bn)),
                           np.float32)
            rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
            g = jax.jit(lambda x, s: quant_matmul_pallas(
                x, qlin, block_override=(bk, bn)).astype(jnp.float32).sum() * 1e-9 + s)
            s = jnp.float32(0); s = g(x0, s); float(s)
            Nc = 60
            t0 = time.perf_counter()
            s = jnp.float32(0)
            for _ in range(Nc):
                s = g(x0, s)
            float(s)
            dt = (time.perf_counter() - t0) / Nc
            cells = (N // bn) * (K // bk)
            print(f"bk={bk:5d} bn={bn:5d} cells={cells:3d}: {dt*1e3:7.3f} ms "
                  f"→ {qbytes/dt/1e9:5.0f} GB/s  rel={rel:.4f}", flush=True)
        except Exception as e:
            print(f"bk={bk:5d} bn={bn:5d}: FAIL {str(e)[:120]}", flush=True)
