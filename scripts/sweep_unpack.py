"""Microbench of dequant strategies inside a Pallas kernel on real TPU.

Isolates the per-element cost of getting packed int weights into the MXU:
  i32shift : widen to i32, shift-extract nibbles (current)
  bf16arith: nibble extract via i8 bitwise AND + exact bf16 arithmetic
  i8cast   : int8 weights, explicit astype(bf16) before dot
  i8direct : int8 weights fed to jnp.dot directly (Mosaic converts)
Each kernel does the same group-pair dots with post-dot scaling.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 16, 3584, 18944
GS = 128
BK, BN = 1792, 512
rng = np.random.default_rng(0)
q4 = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
q8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
scales = jnp.full((K // GS, N), 0.01, jnp.float32)
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)


def kernel(mode, x_ref, q_ref, s_ref, o_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    if mode in ("i32shift", "bf16arith"):
        for p in range(BK // (2 * GS)):
            slab = q_ref[p * GS:(p + 1) * GS, :]
            if mode == "i32shift":
                s32 = slab.astype(jnp.int32)
                lo = jnp.right_shift(jnp.left_shift(s32, 28), 28).astype(jnp.bfloat16)
                hi = jnp.right_shift(jnp.left_shift(s32, 24), 28).astype(jnp.bfloat16)
            else:
                lo4 = jnp.bitwise_and(slab, jnp.int8(15))
                m8 = jnp.bitwise_and(lo4, jnp.int8(8))
                lo_i = lo4 - m8 - m8                       # i8 sub
                lo = lo_i.astype(jnp.bfloat16)
                hi = (slab.astype(jnp.bfloat16) - lo4.astype(jnp.bfloat16)) * 0.0625
            xl = x_ref[:, (2 * p) * GS:(2 * p + 1) * GS]
            xh = x_ref[:, (2 * p + 1) * GS:(2 * p + 2) * GS]
            acc = acc + jnp.dot(xl, lo, preferred_element_type=jnp.float32) * s_ref[0, 2 * p]
            acc = acc + jnp.dot(xh, hi, preferred_element_type=jnp.float32) * s_ref[0, 2 * p + 1]
    else:
        for g in range(BK // GS):
            slab = q_ref[g * GS:(g + 1) * GS, :]
            if mode == "i8cast":
                w = slab.astype(jnp.bfloat16)
            else:
                w = slab
            xg = x_ref[:, g * GS:(g + 1) * GS]
            acc = acc + jnp.dot(xg, w, preferred_element_type=jnp.float32) * s_ref[0, g]
    acc_ref[:] = acc

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def build(mode):
    packed = mode in ("i32shift", "bf16arith")
    pack = 2 if packed else 1
    qq = q4 if packed else q8
    gpb = BK // GS
    s3 = scales.reshape(K // BK, gpb, N)
    f = pl.pallas_call(
        functools.partial(kernel, mode),
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // pack, BN), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb, BN), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return jax.jit(lambda x, s: f(x, qq, s3).astype(jnp.float32).sum() * 1e-9 + s), qq


for mode in ("i32shift", "bf16arith", "i8cast", "i8direct"):
    try:
        f, qq = build(mode)
        s = jnp.float32(0)
        s = f(x, s); float(s)  # compile + sync
        Nc = 60
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(Nc):
            s = f(x, s)
        float(s)  # single hard sync after the chain
        dt = (time.perf_counter() - t0) / Nc
        qbytes = qq.size
        print(f"{mode:9s}: {dt*1e3:7.3f} ms → {qbytes/dt/1e9:5.0f} GB/s weight-read",
              flush=True)
    except Exception as e:
        print(f"{mode:9s}: FAIL {str(e)[:200]}", flush=True)
