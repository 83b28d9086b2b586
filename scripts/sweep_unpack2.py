"""Round 2 dequant microbench: test the dot-serialization hypothesis.

  i8_onedot   : cast whole [BK,BN] slab to bf16, ONE dot, per-channel
                post-scale (per-channel int8 — no group loop at all)
  i8_i8dot    : int8 x int8 → int32 MXU-native dot (quantized activations)
  i4_onedot   : full-slab i32-shift unpack + scale, ONE dot per nibble plane
  i4_grouped  : (reference) current per-group post-scale loop
"""
import functools
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
sc_chan = jnp.full((N,), 0.01, jnp.float32)          # per-channel (int8)
sc_grp = jnp.full((K // GS, N), 0.01, jnp.float32)   # group-wise (int4)
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127, 127).astype(jnp.int8)


def k_i8_onedot(x_ref, q_ref, s_ref, o_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], q_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def k_i8_i8dot(x_ref, q_ref, s_ref, o_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], q_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * s_ref[0]).astype(o_ref.dtype)


def k_i4_onedot(x_ref, q_ref, s_ref, o_ref, acc_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s32 = q_ref[:].astype(jnp.int32)
    gpb2 = BK // (2 * GS)
    lo = jnp.right_shift(jnp.left_shift(s32, 28), 28).astype(jnp.bfloat16)
    hi = jnp.right_shift(jnp.left_shift(s32, 24), 28).astype(jnp.bfloat16)
    # scale whole planes: rows r of plane belong to group 2*(r//GS)(+1)
    s_lo = s_ref[0, 0::2].reshape(gpb2, 1, BN)
    s_hi = s_ref[0, 1::2].reshape(gpb2, 1, BN)
    lo = (lo.reshape(gpb2, GS, BN) * s_lo).reshape(BK // 2, BN).astype(jnp.bfloat16)
    hi = (hi.reshape(gpb2, GS, BN) * s_hi).reshape(BK // 2, BN).astype(jnp.bfloat16)
    # x columns for lo plane: even 128-blocks; hi plane: odd 128-blocks
    xv = x_ref[:].reshape(M, gpb2, 2, GS)
    x_lo = xv[:, :, 0, :].reshape(M, BK // 2)
    x_hi = xv[:, :, 1, :].reshape(M, BK // 2)
    acc_ref[:] += (jnp.dot(x_lo, lo, preferred_element_type=jnp.float32) +
                   jnp.dot(x_hi, hi, preferred_element_type=jnp.float32))

    @pl.when(kt == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def build(name):
    if name == "i8_onedot":
        kern, qq, pack, xx = k_i8_onedot, q8, 1, x
        s_in, s_spec = sc_chan.reshape(1, N), pl.BlockSpec((1, BN), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM)
        acc_dt = jnp.float32
    elif name == "i8_i8dot":
        kern, qq, pack, xx = k_i8_i8dot, q8, 1, x8
        s_in, s_spec = sc_chan.reshape(1, N), pl.BlockSpec((1, BN), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM)
        acc_dt = jnp.int32
    elif name == "i4_onedot":
        kern, qq, pack, xx = k_i4_onedot, q4, 2, x
        gpb = BK // GS
        s_in = sc_grp.reshape(K // BK, gpb, N)
        s_spec = pl.BlockSpec((1, gpb, BN), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM)
        acc_dt = jnp.float32
    f = pl.pallas_call(
        kern,
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((M, BK), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // pack, BN), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((M, BN), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return jax.jit(lambda a, s: f(a, qq, s_in).astype(jnp.float32).sum() * 1e-9 + s), qq, xx


for name in ("i8_onedot", "i8_i8dot", "i4_onedot"):
    try:
        f, qq, xx = build(name)
        s = jnp.float32(0); s = f(xx, s); float(s)
        Nc = 60
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(Nc):
            s = f(xx, s)
        float(s)
        dt = (time.perf_counter() - t0) / Nc
        print(f"{name:10s}: {dt*1e3:7.3f} ms → {qq.size/dt/1e9:5.0f} GB/s weight-read",
              flush=True)
    except Exception as e:
        print(f"{name:10s}: FAIL {str(e)[:300]}", flush=True)
