"""Fused-kernel timing that dodges the remote-compile 413 limit.

The axon remote-compile request grows with the executable's argument
buffers (HTTP 413 near ~0.5 GB of args), so instead of passing the KV
cache in, each jitted probe GENERATES its operands on device and chains
``n`` dependent kernel calls; differencing two chain lengths of the same
structure cancels both the RTT and the generation cost.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from qwen_inference_engine_tpu.ops.decode_attention import _decode_attention  # noqa: E402
from qwen_inference_engine_tpu.ops.fused_step import fused_attn_mlp  # noqa: E402
from qwen_inference_engine_tpu.ops.linear import QuantLinear  # noqa: E402
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas  # noqa: E402

L, B, Hk, G8, D, S = 2, 112, 4, 8, 128, 1024
Ba, Mb = 56, 56
K, F, gs, gsd = 3584, 18944, 256, 128
SCALE = D ** -0.5


def _operands(key):
    ks = jax.random.split(key, 8)
    kc = jax.random.normal(ks[0], (L, B, Hk, S, D), jnp.bfloat16)
    vc = jax.random.normal(ks[1], (L, B, Hk, S, D), jnp.bfloat16)
    q = jax.random.normal(ks[2], (Ba, Hk, G8, D), jnp.bfloat16)
    x = jax.random.normal(ks[3], (Mb, K), jnp.bfloat16)
    wg = jax.random.randint(ks[4], (L, K // 2, F), -128, 128, jnp.int8)
    wu = jax.random.randint(ks[5], (L, K // 2, F), -128, 128, jnp.int8)
    wd = jax.random.randint(ks[6], (L, F // 2, K), -128, 128, jnp.int8)
    sg = jax.random.uniform(ks[7], (L, K // gs, F), jnp.float32, 1e-3, 2e-3)
    su = sg * 1.1
    sd = jax.random.uniform(ks[7], (L, F // gsd, K), jnp.float32, 1e-3, 2e-3)
    lens = jnp.full((Ba,), S - 7, jnp.int32)
    layer = jnp.asarray([1], jnp.int32)
    return kc, vc, q, x, wg, wu, wd, sg, su, sd, lens, layer


def time_chain(step, n_hi=16, n_lo=2, calls=4, tag=""):
    """step(ops, q, x) -> (q', x'); chains n dependent calls per jit."""

    def build(n):
        @jax.jit
        def f(key):
            ops = _operands(key)

            def body(carry, _):
                q, x = step(ops, *carry)
                return (q, x), None

            (q, x), _ = jax.lax.scan(body, (ops[2], ops[3]), None, length=n)
            return jnp.sum(q.astype(jnp.float32)) + jnp.sum(
                x.astype(jnp.float32))
        return f

    f_hi, f_lo = build(n_hi), build(n_lo)
    key = jax.random.PRNGKey(0)
    np.asarray(f_lo(key)); np.asarray(f_hi(key))  # compile + warm

    def t(f):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = f(key)
        np.asarray(r)
        return time.perf_counter() - t0

    t_lo = t(f_lo)
    t_hi = t(f_hi)
    us = (t_hi - t_lo) / (calls * (n_hi - n_lo)) * 1e6
    print(f"{tag}: {us:.1f} us")
    return us


def main():
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ring = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import os
    skip_base = os.environ.get("SKIP_BASE") == "1"

    def attn_step(ops, q, x):
        kc, vc, *_ , lens, layer = ops[0], ops[1], ops[4], ops[10], ops[11]
        out = _decode_attention(ops[10], ops[11], q, kc, vc, scale=SCALE)
        return q + out * 1e-6, x

    t_attn = 0.0 if skip_base else time_chain(
        attn_step, tag=f"attention (Ba={Ba}, S={S})")

    def mlp_step(ops, q, x):
        wg, wu, wd, sg, su, sd = ops[4], ops[5], ops[6], ops[7], ops[8], ops[9]
        li = jnp.int32(1)
        ling = QuantLinear(q=wg, scales=sg, b=None, bits=4, group_size=gs)
        linu = QuantLinear(q=wu, scales=su, b=None, bits=4, group_size=gs)
        lind = QuantLinear(q=wd, scales=sd, b=None, bits=4, group_size=gsd)
        g = quant_matmul_pallas(x, ling, layer=li)
        u = quant_matmul_pallas(x, linu, layer=li)
        y = quant_matmul_pallas(jax.nn.silu(g) * u, lind, layer=li)
        return q, x + y * 1e-6

    t_mlp = 0.0 if skip_base else time_chain(mlp_step, tag="plain 3-op MLP")

    def fused_step(ops, q, x):
        kc, vc, _, _, wg, wu, wd, sg, su, sd, lens, layer = ops
        attn, y = fused_attn_mlp(lens, layer, layer, q, kc, vc, x,
                                 wg, sg, wu, su, wd, sd, scale=SCALE,
                                 gs_gate=gs, gs_down=gsd,
                                 block_n=bn, block_s=bs, row0=0, ring=ring)
        return q + attn * 1e-6, x + y * 1e-6

    t_f = time_chain(fused_step,
                     tag=f"fused attn+MLP (bn={bn}, bs={bs}, ring={ring})")
    print(f"sum={t_attn + t_mlp:.1f}  max={max(t_attn, t_mlp):.1f}  "
          f"gain={t_attn + t_mlp - t_f:.1f} us")

    def fused_mlp_only(ops, q, x):
        # 2 attention rows ≈ nothing: isolates the fused kernel's MLP cost
        kc, vc, _, _, wg, wu, wd, sg, su, sd, lens, layer = ops
        attn, y = fused_attn_mlp(lens[:2], layer, layer, q[:2], kc, vc, x,
                                 wg, sg, wu, su, wd, sd, scale=SCALE,
                                 gs_gate=gs, gs_down=gsd,
                                 block_n=bn, block_s=bs, row0=0)
        return q + jnp.pad(attn, ((0, Ba - 2),) + ((0, 0),) * 3) * 1e-6, \
            x + y * 1e-6

    if not skip_base:
        time_chain(fused_mlp_only,
                   tag=f"fused, MLP-dominated (bn={bn}, bs={bs})")
        extra(bn, bs)


def extra(bn, bs):
    """Diagnostic: waits+DMAs but no attention compute."""
    def fused_nocompute(ops, q, x):
        kc, vc, _, _, wg, wu, wd, sg, su, sd, lens, layer = ops
        attn, y = fused_attn_mlp(lens, layer, layer, q, kc, vc, x,
                                 wg, sg, wu, su, wd, sd, scale=SCALE,
                                 gs_gate=gs, gs_down=gsd,
                                 block_n=bn, block_s=bs, row0=0,
                                 skip_attn_compute=True)
        return q + attn * 1e-6, x + y * 1e-6

    time_chain(fused_nocompute, tag=f"fused, DMA-only attn (bn={bn}, bs={bs})")


if __name__ == "__main__":
    main()
