"""Can the MXU consume int8 operands directly in pallas? Test mixed dots."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

key = jax.random.PRNGKey(0)
M, K, N = 32, 3584, 18944
BK, BN = 1792, 512


def make_call(kern, w, x_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
              acc_dtype=jnp.float32):
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


def bench(name, kern, w, x_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
          acc_dtype=jnp.float32, nbytes=None):
    call = make_call(kern, w, x_dtype, out_dtype, acc_dtype)
    if x_dtype == jnp.int8:
        mk = lambda n: jax.random.randint(key, (n, M, K), -127, 128, jnp.int8)
    else:
        mk = lambda n: jax.random.normal(key, (n, M, K), x_dtype)
    try:
        y = call(w, mk(1)[0])
        np.asarray(y)
        us = marginal_us(lambda w_, xx: call(w_, xx), w, mk)
        nb = nbytes or w.size * w.dtype.itemsize
        print(f"{name}: {us:7.1f} us  {nb/(us*1e-6)/1e9:5.0f} GB/s")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:130]}")


# 1. mixed: x bf16 @ w int8 directly
def k_mixed(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


w8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
bench("mixed bf16 @ s8", k_mixed, w8)


# 2. s8 @ s8 native, i32 acc
def k_s8(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


bench("s8 @ s8 -> i32", k_s8, w8, x_dtype=jnp.int8, out_dtype=jnp.int32,
      acc_dtype=jnp.int32)


# 3. unpack int4 (i32 bitwise) -> i8, then s8 @ s8
HALF_BK = BK // 2


def k_w4a8(x_ref, q_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    b = q_ref[:].astype(jnp.int32)
    lo = jnp.bitwise_and(b, 0xF).astype(jnp.int8)         # lo+8 in [0,15]
    hi = jnp.right_shift(b - jnp.bitwise_and(b, 0xF), 4).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, :HALF_BK], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, HALF_BK:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_w4a8(w, x):
    return pl.pallas_call(
        k_w4a8,
        grid=(1, N // BN, K // BK),
        in_specs=[pl.BlockSpec((M, BK), lambda i, j, k: (i, k)),
                  pl.BlockSpec((HALF_BK, BN), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((M, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


q4 = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
try:
    mk = lambda n: jax.random.randint(key, (n, M, K), -127, 128, jnp.int8)
    y = call_w4a8(q4, mk(1)[0])
    np.asarray(y)
    us = marginal_us(lambda w_, xx: call_w4a8(w_, xx), q4, mk)
    print(f"w4a8 unpack+s8 dot: {us:7.1f} us  {q4.size/(us*1e-6)/1e9:5.0f} GB/s")
except Exception as e:
    print(f"w4a8 unpack+s8 dot: FAIL {type(e).__name__} {str(e)[:130]}")


# 4. unpack int4 -> i8 then mixed bf16 dot
def k_w4a16(x_ref, q_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    b = q_ref[:].astype(jnp.int32)
    lo = jnp.bitwise_and(b, 0xF).astype(jnp.int8)
    hi = jnp.right_shift(b - jnp.bitwise_and(b, 0xF), 4).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, :HALF_BK], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, HALF_BK:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_w4a16(w, x):
    return pl.pallas_call(
        k_w4a16,
        grid=(1, N // BN, K // BK),
        in_specs=[pl.BlockSpec((M, BK), lambda i, j, k: (i, k)),
                  pl.BlockSpec((HALF_BK, BN), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((M, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


try:
    mk = lambda n: jax.random.normal(key, (n, M, K), jnp.bfloat16)
    y = call_w4a16(q4, mk(1)[0])
    np.asarray(y)
    us = marginal_us(lambda w_, xx: call_w4a16(w_, xx), q4, mk)
    print(f"w4a16 unpack+mixed dot: {us:7.1f} us  {q4.size/(us*1e-6)/1e9:5.0f} GB/s")
except Exception as e:
    print(f"w4a16 unpack+mixed dot: FAIL {type(e).__name__} {str(e)[:130]}")


# 5. FULL w4a16 production candidate: parity unpack -> i8, batched mixed
# dots per scale group, post-dot scale + excess-8 offset correction
GS = 128
PAIRS = HALF_BK // GS


def k_w4a16g(xe_ref, xo_ref, q_ref, se_ref, so_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    m = xe_ref.shape[0]
    bn = q_ref.shape[-1]
    b = q_ref[:].astype(jnp.int32)
    l8 = jnp.bitwise_and(b, 0xF)
    lo = l8.astype(jnp.int8).reshape(PAIRS, GS, bn)           # lo+8
    hi = jnp.right_shift(b - l8, 4).astype(jnp.int8).reshape(PAIRS, GS, bn)
    xe3 = xe_ref[:].reshape(m, PAIRS, GS).swapaxes(0, 1)
    xo3 = xo_ref[:].reshape(m, PAIRS, GS).swapaxes(0, 1)
    pe = jax.lax.dot_general(xe3, lo, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    po = jax.lax.dot_general(xo3, hi, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    sxe = jnp.sum(xe3.astype(jnp.float32), axis=2) * 8.0
    se = se_ref[0][:, None, :]
    so = so_ref[0][:, None, :]
    acc_ref[:] += ((pe - sxe[:, :, None]) * se).sum(0) + (po * so).sum(0)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_w4a16g(wpack, x):
    q, se, so = wpack
    kt = K // BK
    pairs_tot = K // (2 * GS)
    xm = x.reshape(M, pairs_tot, 2, GS)
    xe = xm[:, :, 0, :].reshape(M, K // 2)
    xo = xm[:, :, 1, :].reshape(M, K // 2)
    return pl.pallas_call(
        k_w4a16g,
        grid=(1, N // BN, kt),
        in_specs=[
            pl.BlockSpec((M, HALF_BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((M, HALF_BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((HALF_BK, BN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, PAIRS, BN), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, PAIRS, BN), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=x.size * 2 + q.size + se.size * 8 + M * N * 2,
            transcendentals=0),
    )(xe, xo, q, se, so)


kt = K // BK
se = jax.random.uniform(key, (kt, PAIRS, N), jnp.float32) * 0.01
so = jax.random.uniform(key, (kt, PAIRS, N), jnp.float32) * 0.01
wpack = (q4, se, so)
try:
    mk = lambda n: jax.random.normal(key, (n, M, K), jnp.bfloat16)
    y = call_w4a16g(wpack, mk(1)[0])
    np.asarray(y)
    us = marginal_us(lambda w_, xx: call_w4a16g(w_, xx), wpack, mk)
    print(f"w4a16 FULL (batched+scales): {us:7.1f} us  {q4.size/(us*1e-6)/1e9:5.0f} GB/s")
except Exception as e:
    print(f"w4a16 FULL: FAIL {type(e).__name__} {str(e)[:160]}")


# 6. same at M=128
M2 = 128


def call_w4a16g_m128(wpack, x):
    q, se_, so_ = wpack
    kt = K // BK
    pairs_tot = K // (2 * GS)
    xm = x.reshape(M2, pairs_tot, 2, GS)
    xe = xm[:, :, 0, :].reshape(M2, K // 2)
    xo = xm[:, :, 1, :].reshape(M2, K // 2)
    return pl.pallas_call(
        k_w4a16g,
        grid=(1, N // BN, kt),
        in_specs=[
            pl.BlockSpec((M2, HALF_BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((M2, HALF_BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((HALF_BK, BN), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, PAIRS, BN), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, PAIRS, BN), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((M2, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M2, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M2, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xe, xo, q, se_, so_)


try:
    mk = lambda n: jax.random.normal(key, (n, M2, K), jnp.bfloat16)
    y = call_w4a16g_m128(wpack, mk(1)[0])
    np.asarray(y)
    us = marginal_us(lambda w_, xx: call_w4a16g_m128(w_, xx), wpack, mk)
    print(f"w4a16 FULL M=128: {us:7.1f} us  {q4.size/(us*1e-6)/1e9:5.0f} GB/s")
except Exception as e:
    print(f"w4a16 FULL M=128: FAIL {type(e).__name__} {str(e)[:160]}")
