"""Final design probe: plane-per-group W4A16 at gs=256/512, w4a8 M=128,
int8 per-channel mixed dot."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

key = jax.random.PRNGKey(0)
K, N = 3584, 18944


def k_plane(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles):
    """q [bk/2, bn]: lo-plane = group 2t, hi-plane = group 2t+1 (gs=bk/2).
    s [1, 2, bn]. byte = 16*hi + (lo+8)."""
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = q_ref[:].astype(jnp.int32)
    l8 = jnp.bitwise_and(b, 0xF)
    lo = l8.astype(jnp.int8)
    hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
    pe = jax.lax.dot_general(xe_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    po = jax.lax.dot_general(xo_ref[:], hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sxe = jnp.sum(xe_ref[:].astype(jnp.float32), axis=1, keepdims=True) * 8.0
    acc_ref[:] += (pe - sxe) * s_ref[0, 0:1, :] + po * s_ref[0, 1:2, :]

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_plane(wpack, x, bk, bn=512):
    q, s2 = wpack                          # q [K/2, N]; s2 [K/bk, 2, N]
    m = x.shape[0]
    k_tiles = K // bk
    half = bk // 2
    xm = x.reshape(m, k_tiles, 2, half)
    xe = xm[:, :, 0, :].reshape(m, K // 2)
    xo = xm[:, :, 1, :].reshape(m, K // 2)
    kern = functools.partial(k_plane, k_tiles=k_tiles)
    return pl.pallas_call(
        kern,
        grid=(1, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((m, half), lambda i, j, k: (i, k)),
            pl.BlockSpec((m, half), lambda i, j, k: (i, k)),
            pl.BlockSpec((half, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, 2, bn), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * N * K,
            bytes_accessed=x.size * 2 + q.size + s2.size * 4 + m * N * 2,
            transcendentals=0),
    )(xe, xo, q, s2)


q4 = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
import itertools, os
w8_g = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
c_g = (jax.random.uniform(key, (1, N)) * 0.01).astype(jnp.float32)
CASES = [(512, 4736), (512, 2368 // 1)] if os.environ.get("P") == "1" else []
for bk, bn_ in ([(512, 4736)] if os.environ.get("P", "1") == "1" else []):
    pass
for bk in ((512,) if os.environ.get("P", "1") == "1" else ()):
    s2 = (jax.random.uniform(key, (K // bk, 2, N)) * 0.01).astype(jnp.float32)
    wp = (q4, s2)
    for m, bn_ in itertools.product((32, 128), (4736,)):
        try:
            mk = lambda n: jax.random.normal(key, (n, m, K), jnp.bfloat16)
            y = call_plane(wp, mk(1)[0], bk, bn_)
            np.asarray(y)
            us = marginal_us(lambda w_, xx: call_plane(w_, xx, bk, bn_), wp, mk)
            print(f"plane gs={bk//2:4d} bn={bn_} M={m:3d}: {us:7.1f} us  "
                  f"{q4.size/(us*1e-6)/1e9:5.0f} GB/s")
        except Exception as e:
            print(f"plane gs={bk//2:4d} bn={bn_} M={m:3d}: FAIL {type(e).__name__} {str(e)[:110]}")


# w4a8 at M=128 (x int8): plane design with s8 dots
def k_plane8(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = q_ref[:].astype(jnp.int32)
    l8 = jnp.bitwise_and(b, 0xF)
    lo = l8.astype(jnp.int8)
    hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
    pe = jax.lax.dot_general(xe_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32).astype(jnp.float32)
    po = jax.lax.dot_general(xo_ref[:], hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32).astype(jnp.float32)
    sxe = jnp.sum(xe_ref[:].astype(jnp.float32), axis=1, keepdims=True) * 8.0
    acc_ref[:] += (pe - sxe) * s_ref[0, 0:1, :] + po * s_ref[0, 1:2, :]

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_plane8(wpack, x, bk, bn=512):
    q, s2 = wpack
    m = x.shape[0]
    k_tiles = K // bk
    half = bk // 2
    xm = x.reshape(m, k_tiles, 2, half)
    xe = xm[:, :, 0, :].reshape(m, K // 2)
    xo = xm[:, :, 1, :].reshape(m, K // 2)
    kern = functools.partial(k_plane8, k_tiles=k_tiles)
    return pl.pallas_call(
        kern,
        grid=(1, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((m, half), lambda i, j, k: (i, k)),
            pl.BlockSpec((m, half), lambda i, j, k: (i, k)),
            pl.BlockSpec((half, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, 2, bn), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xe, xo, q, s2)


for bk in ((1792, 512) if os.environ.get("P", "1") == "2" else ()):
    s2 = (jax.random.uniform(key, (K // bk, 2, N)) * 0.01).astype(jnp.float32)
    wp = (q4, s2)
    for m in (32, 128):
        try:
            mk = lambda n: jax.random.randint(key, (n, m, K), -127, 128, jnp.int8)
            y = call_plane8(wp, mk(1)[0], bk)
            np.asarray(y)
            us = marginal_us(lambda w_, xx: call_plane8(w_, xx, bk), wp, mk)
            print(f"plane8 (a8) gs={bk//2} M={m:3d}: {us:7.1f} us  "
                  f"{q4.size/(us*1e-6)/1e9:5.0f} GB/s")
        except Exception as e:
            print(f"plane8 gs={bk//2} M={m}: FAIL {type(e).__name__} {str(e)[:110]}")


# w8a8: int8 x, int8 w, single s8 dot, per-channel + per-token post-scale
def k_w8a8(x_ref, q_ref, c_ref, o_ref, acc_ref, *, k_tiles):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(x_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * c_ref[0]).astype(o_ref.dtype)


def call_w8a8(wpack, x, bk=1792, bn=512):
    q, c = wpack
    m = x.shape[0]
    k_tiles = K // bk
    kern = functools.partial(k_w8a8, k_tiles=k_tiles)
    return pl.pallas_call(
        kern,
        grid=(1, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, q, c)


for m in ((32, 128) if os.environ.get("P", "1") == "2" else ()):
    try:
        mk = lambda n: jax.random.randint(key, (n, m, K), -127, 128, jnp.int8)
        y = call_w8a8((w8_g, c_g), mk(1)[0])
        np.asarray(y)
        us = marginal_us(lambda w_, xx: call_w8a8(w_, xx), (w8_g, c_g), mk)
        print(f"w8a8 per-channel M={m:3d}: {us:7.1f} us  {w8_g.size/(us*1e-6)/1e9:5.0f} GB/s")
    except Exception as e:
        print(f"w8a8 M={m}: FAIL {type(e).__name__} {str(e)[:110]}")


# int8 weights, per-channel scale at epilogue, single mixed dot
def k_w8(x_ref, q_ref, c_ref, o_ref, acc_ref, *, k_tiles):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(x_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = (acc_ref[:] * c_ref[0]).astype(o_ref.dtype)


def call_w8(wpack, x, bk=1792, bn=512):
    q, c = wpack
    m = x.shape[0]
    k_tiles = K // bk
    kern = functools.partial(k_w8, k_tiles=k_tiles)
    return pl.pallas_call(
        kern,
        grid=(1, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, q, c)


w8_g = w8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
c_g = c = (jax.random.uniform(key, (1, N)) * 0.01).astype(jnp.float32)
for m in ((32, 128) if os.environ.get("P", "1") == "3" else ()):
    try:
        mk = lambda n: jax.random.normal(key, (n, m, K), jnp.bfloat16)
        y = call_w8((w8, c), mk(1)[0])
        np.asarray(y)
        us = marginal_us(lambda w_, xx: call_w8(w_, xx), (w8, c), mk)
        print(f"w8 per-channel M={m:3d}: {us:7.1f} us  {w8.size/(us*1e-6)/1e9:5.0f} GB/s")
    except Exception as e:
        print(f"w8 M={m}: FAIL {type(e).__name__} {str(e)[:110]}")
