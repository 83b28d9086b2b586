"""Probe per-pallas_call fixed overhead + XLA matmul baselines on this chip."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

key = jax.random.PRNGKey(0)


# 1. trivial pallas kernel: copy [8,128]
def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def tiny_pallas(w, x):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


mk = lambda n: jax.random.normal(key, (n, 8, 128), jnp.float32)
us = marginal_us(tiny_pallas, jnp.float32(0), mk)
print(f"tiny pallas copy [8,128]:      {us:8.1f} us/call")
us = marginal_us(lambda w, x: x * 2.0, jnp.float32(0), mk)
print(f"tiny XLA mul [8,128]:          {us:8.1f} us/call")

# 2. XLA bf16 dot at gate shape (BW reference)
D, F = 3584, 18944
B = 32
wg = jax.random.normal(key, (D, F), jnp.bfloat16)
mk = lambda n: jax.random.normal(key, (n, B, D), jnp.bfloat16)
us = marginal_us(lambda w, x: jnp.dot(x, w, preferred_element_type=jnp.float32), wg, mk)
print(f"XLA bf16 dot [32x{D}]x[{D}x{F}]: {us:8.1f} us  {wg.size*2/(us*1e-6)/1e9:6.0f} GB/s")


# 3. pallas bf16 matmul same shape
def mm_kernel(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_mm(w, x, bk=1792, bn=512):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        mm_kernel,
        grid=(1, n // bn, k // bk),
        in_specs=[pl.BlockSpec((m, bk), lambda i, j, kk: (0, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


us = marginal_us(lambda w, x: pallas_mm(w, x), wg, mk)
print(f"pallas bf16 mm same shape:     {us:8.1f} us  {wg.size*2/(us*1e-6)/1e9:6.0f} GB/s")

# 4. XLA int8 weight dequant dot
q8 = jax.random.randint(key, (D, F), -127, 128, jnp.int8)
us = marginal_us(lambda w, x: jnp.dot(x, w.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32), q8, mk)
print(f"XLA int8->bf16 dot:            {us:8.1f} us  {q8.size/(us*1e-6)/1e9:6.0f} GB/s")


# 5. pallas int8 mm (cast in kernel)
def mm8_kernel(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    w = w_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_mm8(w, x, bk=1792, bn=512):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        mm8_kernel,
        grid=(1, n // bn, k // bk),
        in_specs=[pl.BlockSpec((m, bk), lambda i, j, kk: (0, kk)),
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


us = marginal_us(lambda w, x: pallas_mm8(w, x), q8, mk)
print(f"pallas int8 mm (cast in krnl): {us:8.1f} us  {q8.size/(us*1e-6)/1e9:6.0f} GB/s")

# 6. pure-stream ceiling: pallas reduce-read of a big bf16 array
BIG = jax.random.normal(key, (8192, 18944), jnp.bfloat16)  # 310 MB


def red_kernel(w_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += jnp.sum(w_ref[:].astype(jnp.float32), axis=0, keepdims=True)[0:8]


def pallas_reduce(w, x, bk=512):
    k = w.shape[0]
    return pl.pallas_call(
        red_kernel,
        grid=(k // bk,),
        in_specs=[pl.BlockSpec((bk, w.shape[1]), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, w.shape[1]), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, w.shape[1]), jnp.float32),
    )(w) * x[0, 0, 0]


us = marginal_us(lambda w, x: pallas_reduce(w, x), BIG, lambda n: mk(n))
print(f"pallas stream-reduce 310MB bf16: {us:8.1f} us  {BIG.size*2/(us*1e-6)/1e9:6.0f} GB/s")
