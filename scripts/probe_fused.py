"""Measure the fused attention+matmul kernel's overlap on the real chip.

Compares, at 7B half-batch decode shapes (Ba=96 rows of a B=192 cache,
gate-proj INT4 matmul for the other half):
  t_attn   — flash decode attention alone
  t_mm     — INT4 quant matmul alone
  t_fused  — one fused call doing both
Perfect overlap -> t_fused ≈ max(t_attn, t_mm); no overlap -> sum.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from tpu_timing import marginal_us  # noqa: E402

from qwen_inference_engine_tpu.ops.decode_attention import (  # noqa: E402
    _decode_attention,
)
from qwen_inference_engine_tpu.ops.fused_step import fused_attn_matmul  # noqa: E402
from qwen_inference_engine_tpu.ops.linear import QuantLinear  # noqa: E402
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    L, B, Hk, G8, D, S = 2, 112, 4, 8, 128, 1024
    Ba, Mb = 56, 56
    K, N, gs = 3584, 18944, 256
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 2368
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    scale = D ** -0.5

    # device-side generation: host->device uploads of ~GB operands trip the
    # remote-compile body limit (HTTP 413) on this tunnel
    kc = jax.random.normal(key, (L, B, Hk, S, D), jnp.bfloat16)
    vc = jax.random.normal(key, (L, B, Hk, S, D), jnp.bfloat16)
    lens = jnp.full((Ba,), S - 7, jnp.int32)
    layer = jnp.asarray([1], jnp.int32)
    wq = jax.random.randint(key, (L, K // 2, N), -128, 128, jnp.int8)
    ws = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 0.001, 0.002)
    lin = QuantLinear(q=wq, scales=ws, b=None, bits=4, group_size=gs)

    def mk_q(n):
        return jax.random.normal(key, (n, Ba, Hk, G8, D), jnp.bfloat16)

    def mk_x(n):
        return jax.random.normal(key, (n, Mb, K), jnp.bfloat16)

    def mk_both(n):
        return (mk_q(n), mk_x(n))

    # attention alone (full-batch kernel on a Ba-row cache for fairness)
    kc_a = kc[:, :Ba]
    vc_a = vc[:, :Ba]
    t_attn = marginal_us(
        lambda w, q: _decode_attention(lens, layer, q, w[0], w[1],
                                       scale=scale),
        (kc_a, vc_a), mk_q, n_scan=8)
    print(f"attention alone (Ba={Ba}, S={S}): {t_attn:.1f} us")

    t_mm = marginal_us(
        lambda w, x: quant_matmul_pallas(x, w, layer=jnp.int32(1)),
        lin, mk_x, n_scan=8)
    print(f"matmul alone ({K}x{N} int4): {t_mm:.1f} us")

    def fused(w, qx):
        q, x = qx
        return fused_attn_matmul(lens, layer, q, w[0], w[1], x, w[2], w[3],
                                 scale=scale, group_size=gs, block_n=bn,
                                 block_s=bs, row0=0)

    t_fused = marginal_us(fused, (kc, vc, wq, ws), mk_both, n_scan=8)
    print(f"fused attn+matmul (bn={bn}, bs={bs}): {t_fused:.1f} us")
    print(f"sum={t_attn + t_mm:.1f}  max={max(t_attn, t_mm):.1f}  "
          f"overlap_gain={(t_attn + t_mm - t_fused):.1f} us "
          f"({100 * (t_attn + t_mm - t_fused) / min(t_attn, t_mm):.0f}% of "
          f"the smaller op hidden)")

    # ---- production shapes: full MLP (gate/up/down) vs fused_attn_mlp ----
    from qwen_inference_engine_tpu.ops.fused_step import fused_attn_mlp

    gsd = 128
    wg = jax.random.randint(key, (L, K // 2, N), -128, 128, jnp.int8)
    wu = jax.random.randint(key, (L, K // 2, N), -128, 128, jnp.int8)
    wdq = jax.random.randint(key, (L, N // 2, K), -128, 128, jnp.int8)
    sg2 = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 1e-3, 2e-3)
    su2 = jax.random.uniform(key, (L, K // gs, N), jnp.float32, 1e-3, 2e-3)
    sd2 = jax.random.uniform(key, (L, N // gsd, K), jnp.float32, 1e-3, 2e-3)
    ling = QuantLinear(q=wg, scales=sg2, b=None, bits=4, group_size=gs)
    linu = QuantLinear(q=wu, scales=su2, b=None, bits=4, group_size=gs)
    lind = QuantLinear(q=wdq, scales=sd2, b=None, bits=4, group_size=gsd)

    def mk_xs(n):
        return jax.random.normal(key, (n, Mb, K), jnp.bfloat16)

    def mlp3(w, x):
        li = jnp.int32(1)
        g = quant_matmul_pallas(x, w[0], layer=li)
        u = quant_matmul_pallas(x, w[1], layer=li)
        return quant_matmul_pallas(jax.nn.silu(g) * u, w[2], layer=li)

    t_mlp3 = marginal_us(mlp3, (ling, linu, lind), mk_xs, n_scan=8)
    print(f"plain 3-op MLP: {t_mlp3:.1f} us")

    bnp = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    bsp = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    def fusedmlp(w, qx):
        q, x = qx
        return fused_attn_mlp(lens, layer, layer, q, w[0], w[1], x,
                              w[2], w[3], w[4], w[5], w[6], w[7],
                              scale=scale, gs_gate=gs, gs_down=gsd,
                              block_n=bnp, block_s=bsp, row0=0)

    t_fmlp = marginal_us(fusedmlp, (kc, vc, wg, sg2, wu, su2, wdq, sd2),
                         mk_both, n_scan=8)
    print(f"fused attn+MLP (bn={bnp}, bs={bsp}): {t_fmlp:.1f} us")
    print(f"sum={t_attn + t_mlp3:.1f}  max={max(t_attn, t_mlp3):.1f}  "
          f"gain={(t_attn + t_mlp3 - t_fmlp):.1f} us")


if __name__ == "__main__":
    main()
