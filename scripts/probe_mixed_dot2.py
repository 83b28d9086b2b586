"""Does the v5e MXU run int8 x int8 at its spec'd 2x-of-bf16 rate through
ANY lowering we can reach (Mosaic dot_general, XLA dot_general, native
int4 operands)?

probe_mixed_dot.py measured s8@s8 == bf16@s8 at M=32 — but that shape is
bandwidth-confounded (weight-byte floor 83 us ~= 1x pass floor 88 us).
This probe de-confounds by raising M to 512: the M-pass count quadruples
(ceil(512/128)=4) while weight bytes stay fixed, so

    pass floor @1x rate: 4*28*148 passes * ~20cyc / 940MHz ~= 352 us
    pass floor @2x rate:                                   ~= 176 us
    weight-byte floor (int8 68 MB @ 819 GB/s):             ~=  83 us

A 2x int8 MXU rate is therefore a 2x wall-clock difference here, far
outside noise. Sections:
  1. bf16 @ s8  (pallas)     — baseline; calibrates the 1x pass model
  2. s8 @ s8 -> i32 (pallas) — the Mosaic int8 path
  3. s8 @ s8 -> i32 (XLA)    — does XLA's own lowering differ?
  4. bf16 @ bf16 (XLA)       — sanity row for the pass model
  5. s4 @ s4 -> i32 (XLA, jnp.int4 operands) — native int4, if supported
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

key = jax.random.PRNGKey(0)
M, K, N = 512, 3584, 18944
BK, BN = 1792, 512
PASSES = -(-M // 128) * (K // 128) * (N // 128)
print(f"M={M} K={K} N={N}: {PASSES} MXU passes "
      f"-> ~{PASSES*20/940e6*1e6:.0f} us @1x, "
      f"~{PASSES*10/940e6*1e6:.0f} us @2x; "
      f"int8 weight bytes {K*N/1e6:.1f} MB -> {K*N/819e9*1e6:.0f} us")


def pallas_call_mm(kern, acc_dtype, out_dtype):
    def call(w, x):
        return pl.pallas_call(
            kern,
            grid=(1, N // BN, K // BK),
            in_specs=[pl.BlockSpec((M, BK), lambda i, j, k: (i, k)),
                      pl.BlockSpec((BK, BN), lambda i, j, k: (k, j))],
            out_specs=pl.BlockSpec((M, BN), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((M, BN), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)
    return call


def bench(name, call, w, x_dtype):
    if x_dtype == jnp.int8:
        mk = lambda n: jax.random.randint(key, (n, M, K), -127, 128, jnp.int8)
    else:
        mk = lambda n: jax.random.normal(key, (n, M, K), x_dtype)
    try:
        y = call(w, mk(1)[0])
        np.asarray(y)
        us = marginal_us(lambda w_, xx: call(w_, xx), w, mk)
        nb = K * N * w.dtype.itemsize if w.dtype != jnp.int4 else K * N // 2
        print(f"{name}: {us:7.1f} us  {nb/(us*1e-6)/1e9:5.0f} GB/s  "
              f"{2*M*K*N/(us*1e-6)/1e12:5.1f} Tops")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:140]}")


def k_acc(acc_pref):
    def kern(x_ref, w_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_pref)
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    return kern


w8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
wb = jax.random.normal(key, (K, N), jnp.bfloat16)

bench("1. pallas bf16 @ s8 -> f32",
      pallas_call_mm(k_acc(jnp.float32), jnp.float32, jnp.bfloat16),
      w8, jnp.bfloat16)
bench("2. pallas s8 @ s8 -> i32",
      pallas_call_mm(k_acc(jnp.int32), jnp.int32, jnp.int32),
      w8, jnp.int8)


def xla_dot(pref):
    @jax.jit
    def call(w, x):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=pref)
    return call


bench("3. XLA s8 @ s8 -> i32", xla_dot(jnp.int32), w8, jnp.int8)
bench("4. XLA bf16 @ bf16 -> f32", xla_dot(jnp.float32), wb, jnp.bfloat16)

# 5. native int4 operands through XLA
try:
    w4 = jax.random.randint(key, (K, N), -8, 8, jnp.int8).astype(jnp.int4)
    call = xla_dot(jnp.int32)
    mk = lambda n: jax.random.randint(
        key, (n, M, K), -8, 8, jnp.int8).astype(jnp.int4)
    y = call(w4, mk(1)[0])
    np.asarray(y)
    us = marginal_us(lambda w_, xx: call(w_, xx), w4, mk)
    print(f"5. XLA s4 @ s4 -> i32: {us:7.1f} us  "
          f"{K*N/2/(us*1e-6)/1e9:5.0f} GB/s  "
          f"{2*M*K*N/(us*1e-6)/1e12:5.1f} Tops")
except Exception as e:
    print(f"5. XLA s4 @ s4 -> i32: FAIL {type(e).__name__} {str(e)[:140]}")

# 6. pallas s8 @ s8 with bf16 accumulate (maybe the i32 accumulate is
# what forces the 1x path)
bench("6. pallas s8 @ s8 -> f32 acc",
      pallas_call_mm(k_acc(jnp.float32), jnp.float32, jnp.bfloat16),
      w8, jnp.int8)
