"""Sweep redesigned fused dequant-matmul kernel variants on the real chip.

Variants (int4, group-pair packed layout from ops/linear.py):
  D: current production kernel (serial per-group dots, post-dot scale)
  A: whole-block unpack + interleave to logical order, scale-fold, ONE dot
  B: parity-split — x pre-split into even/odd group columns outside the
     kernel; kernel does unpack + scale-fold + TWO dots, zero shuffles
  C: batched group dots (dot_general with batch dim) + post-scale + sum

int8:
  E: whole-block cast + scale-fold, one dot
  (control: XLA int8->bf16 dot, ~757 GB/s effective)
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from tpu_timing import marginal_us

from qwen_inference_engine_tpu.ops.linear import QuantLinear, dequantize, unpack_nibbles

key = jax.random.PRNGKey(0)
B = 32
GS = 128


def mk_qlin(kin, out, bits=4):
    pack = 2 if bits == 4 else 1
    q = jax.random.randint(key, (kin // pack, out), -7, 8, dtype=jnp.int8)
    scales = (jax.random.uniform(key, (kin // GS, out)) * 0.01 + 0.005).astype(jnp.float32)
    return QuantLinear(q=q, scales=scales, b=None, bits=bits, group_size=GS)


# ---------------- variant A: unpack+interleave, scale-fold, one dot ------
def _kA(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = GS
    bn = q_ref.shape[-1]
    pairs = block_k // (2 * g)
    lo, hi = unpack_nibbles(q_ref[:])            # [bk/2, bn] each
    lo = lo.reshape(pairs, 1, g, bn)
    hi = hi.reshape(pairs, 1, g, bn)
    w = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # [pairs,2,g,bn]
    s = s_ref[0].reshape(pairs, 2, 1, bn).astype(jnp.bfloat16)
    w = (w * s).reshape(block_k, bn)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------- variant B: parity split, two dots ----------------------
def _kB(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = GS
    bn = q_ref.shape[-1]
    half = block_k // 2
    pairs = half // g
    lo, hi = unpack_nibbles(q_ref[:])            # [half, bn]
    s = s_ref[0]                                  # [2*pairs, bn] f32
    se = s.reshape(pairs, 2, bn)[:, 0, :][:, None, :].astype(jnp.bfloat16)
    so = s.reshape(pairs, 2, bn)[:, 1, :][:, None, :].astype(jnp.bfloat16)
    wl = (lo.reshape(pairs, g, bn).astype(jnp.bfloat16) * se).reshape(half, bn)
    wh = (hi.reshape(pairs, g, bn).astype(jnp.bfloat16) * so).reshape(half, bn)
    acc_ref[:] += jnp.dot(xe_ref[:], wl, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xo_ref[:], wh, preferred_element_type=jnp.float32)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------- variant C: batched group dots + post-scale -------------
def _kC(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = GS
    m = x_ref.shape[0]
    bn = q_ref.shape[-1]
    pairs = block_k // (2 * g)
    lo, hi = unpack_nibbles(q_ref[:])
    w = jnp.stack([lo.reshape(pairs, g, bn), hi.reshape(pairs, g, bn)],
                  axis=1).astype(jnp.bfloat16).reshape(2 * pairs, g, bn)
    # x arranged [m, 2*pairs(logical groups), g] — group p slab matches w[p]
    xg = x_ref[:].reshape(m, 2 * pairs, g).swapaxes(0, 1)  # [2p, m, g]
    part = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)     # [2p, m, bn]
    s = s_ref[0][:, None, :]                     # [2p, 1, bn]
    acc_ref[:] += jnp.sum(part * s, axis=0)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------- variant E: int8 cast + scale-fold, one dot -------------
def _kE(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = GS
    bn = q_ref.shape[-1]
    groups = block_k // g
    w = q_ref[:].astype(jnp.bfloat16).reshape(groups, g, bn)
    s = s_ref[0][:, None, :].astype(jnp.bfloat16)
    w = (w * s).reshape(block_k, bn)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_variant(variant, x, lin, bk, bn):
    m, k = x.shape
    n = lin.out_features
    pack = 2 if lin.bits == 4 else 1
    k_tiles = k // bk
    n_tiles = n // bn
    gpb = bk // GS
    scales3 = lin.scales.reshape(k_tiles, gpb, n)
    kern = {"A": _kA, "B": _kB, "C": _kC, "E": _kE}[variant]
    kern = functools.partial(kern, k_tiles=k_tiles, block_k=bk)

    common = dict(
        grid=(1, n_tiles, k_tiles),
        out_specs=pl.BlockSpec((m, bn), lambda mt, nt, kt: (mt, nt)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=x.size * 2 + lin.q.size + lin.scales.size * 4 + m * n * 2,
            transcendentals=0),
    )
    q_spec = pl.BlockSpec((bk // pack, bn), lambda mt, nt, kt: (kt, nt))
    s_spec = pl.BlockSpec((1, gpb, bn), lambda mt, nt, kt: (kt, 0, nt))

    if variant == "B":
        g = GS
        pairs_tot = k // (2 * g)
        x4 = x.reshape(m, pairs_tot, 2, g)
        xe = x4[:, :, 0, :].reshape(m, k // 2)
        xo = x4[:, :, 1, :].reshape(m, k // 2)
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((m, bk // 2), lambda mt, nt, kt: (mt, kt)),
                pl.BlockSpec((m, bk // 2), lambda mt, nt, kt: (mt, kt)),
                q_spec, s_spec,
            ],
            **common,
        )(xe, xo, lin.q, scales3)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((m, bk), lambda mt, nt, kt: (mt, kt)),
                  q_spec, s_spec],
        **common,
    )(x, lin.q, scales3)


def run_shape(name, kin, out, bits, configs):
    lin = mk_qlin(kin, out, bits)
    x = jax.random.normal(key, (B, kin), jnp.bfloat16)
    ref = jnp.dot(x, dequantize(lin), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(ref)
    ideal_us = (lin.q.size + lin.scales.size * 4) / 819e9 * 1e6
    print(f"\n== {name} [{B}x{kin}]x[{kin}x{out}] int{bits} "
          f"(ideal {ideal_us:.0f} us) ==")
    for variant, bk, bn in configs:
        if kin % bk or out % bn:
            continue
        try:
            y = call_variant(variant, x, lin, bk, bn)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))) /
                        (float(jnp.max(jnp.abs(ref))) + 1e-9))
            mk = lambda n: jax.random.normal(key, (n, B, kin), jnp.bfloat16)
            us = marginal_us(
                lambda w, xx: call_variant(variant, xx, w, bk, bn), lin, mk)
            gbs = (lin.q.size + lin.scales.size * 4) / (us * 1e-6) / 1e9
            print(f"{variant} bk={bk:5d} bn={bn:4d}: {us:7.1f} us  {gbs:5.0f} GB/s  relerr={err:.1e}")
        except Exception as e:
            print(f"{variant} bk={bk:5d} bn={bn:4d}: FAIL {type(e).__name__} {str(e)[:120]}")



# ---------------- variant F: excess-8 nibbles, bf16 floor-unpack, ---------
# batched dots + post-dot scale & offset correction --------------------
def _kF(xe_ref, xo_ref, q_ref, se_ref, so_ref, o_ref, acc_ref, *, k_tiles, block_k):
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = GS
    m = xe_ref.shape[0]
    bn = q_ref.shape[-1]
    half = block_k // 2
    pairs = half // g
    # signed storage: byte = 16*hi + (lo+8); floor(b/16) = hi (signed),
    # b - 16*hi = lo+8 in [0,15] (corrected post-dot).
    # NB: floor must run in f32 — bf16 floor crashes Mosaic on this backend.
    b = q_ref[:].astype(jnp.float32)          # [half, bn], -128..127 exact
    h = jnp.floor(b * (1 / 16))               # = hi in [-8,7]
    l = b - h * 16.0                          # = lo+8 in [0,15]
    lo3 = l.astype(jnp.bfloat16).reshape(pairs, g, bn)
    hi3 = h.astype(jnp.bfloat16).reshape(pairs, g, bn)
    xe3 = xe_ref[:].reshape(m, pairs, g).swapaxes(0, 1)   # [pairs, m, g]
    xo3 = xo_ref[:].reshape(m, pairs, g).swapaxes(0, 1)
    pe = jax.lax.dot_general(xe3, lo3, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [pairs,m,bn]
    po = jax.lax.dot_general(xo3, hi3, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    sxe = jnp.sum(xe3.astype(jnp.float32), axis=2) * 8.0  # [pairs, m]
    se = se_ref[0][:, None, :]                # [pairs, 1, bn] f32
    so = so_ref[0][:, None, :]
    y = ((pe - sxe[:, :, None]) * se).sum(0) + (po * so).sum(0)
    acc_ref[:] += y

    @pl.when(kt == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def call_F(x, q_u8, scales, bk, bn):
    """q_u8 [K/2, N] int8: byte = 16*hi + (lo+8), hi/lo in [-8,7];
    logical row 2p*G+r -> lo of packed row p*G+r, (2p+1)*G+r -> hi.
    scales [K/GS, N] f32."""
    m, k = x.shape
    n = q_u8.shape[-1]
    k_tiles = k // bk
    gpb = bk // GS
    pairs = gpb // 2
    g = GS
    # scales rearranged: even groups / odd groups contiguous per k-block
    s4 = scales.reshape(k_tiles, pairs, 2, n)
    s_even = s4[:, :, 0, :]   # [k_tiles, pairs, n]
    s_odd = s4[:, :, 1, :]
    pairs_tot = k // (2 * g)
    x4 = x.reshape(m, pairs_tot, 2, g)
    xe = x4[:, :, 0, :].reshape(m, k // 2)
    xo = x4[:, :, 1, :].reshape(m, k // 2)
    kern = functools.partial(_kF, k_tiles=k_tiles, block_k=bk)
    return pl.pallas_call(
        kern,
        grid=(1, n // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((m, bk // 2), lambda mt, nt, kt: (mt, kt)),
            pl.BlockSpec((m, bk // 2), lambda mt, nt, kt: (mt, kt)),
            pl.BlockSpec((bk // 2, bn), lambda mt, nt, kt: (kt, nt)),
            pl.BlockSpec((1, pairs, bn), lambda mt, nt, kt: (kt, 0, nt)),
            pl.BlockSpec((1, pairs, bn), lambda mt, nt, kt: (kt, 0, nt)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda mt, nt, kt: (mt, nt)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=x.size * 2 + q_u8.size + scales.size * 4 + m * n * 2,
            transcendentals=0),
    )(xe, xo, q_u8, s_even, s_odd)


def run_F(name, kin, out, configs):
    g = GS
    # logical int4 values [-8, 7] and group scales
    v = jax.random.randint(key, (kin, out), -8, 8, jnp.int8)
    scales = (jax.random.uniform(key, (kin // g, out)) * 0.01 + 0.005).astype(jnp.float32)
    # pack excess-8: packed row p*g+r <- lo = group 2p, hi = group 2p+1
    v3 = jnp.reshape(v, (kin // (2 * g), 2, g, out))
    lo = v3[:, 0].reshape(kin // 2, out).astype(jnp.int32)
    hi = v3[:, 1].reshape(kin // 2, out).astype(jnp.int32)
    q_u8 = (hi * 16 + lo + 8).astype(jnp.int8)  # signed: 16*hi + (lo+8)
    # kernel will read as uint8 via +128... simpler: keep 0..255 in int8 via
    # bitcast at call time; here just test with offset folded:
    x = jax.random.normal(key, (B, kin), jnp.bfloat16)
    w = (v.astype(jnp.float32).reshape(kin // g, g, out) * scales[:, None, :]
         ).reshape(kin, out).astype(jnp.bfloat16)
    ref = np.asarray(jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    ideal_us = (q_u8.size + scales.size * 4) / 819e9 * 1e6
    print(f"\n== F {name} [{B}x{kin}]x[{kin}x{out}] int4x8 (ideal {ideal_us:.0f} us) ==")
    for bk, bn in configs:
        if kin % bk or out % bn:
            continue
        try:
            qq = q_u8
            y = call_F(x, qq, scales, bk, bn)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))) /
                        (float(jnp.max(jnp.abs(ref))) + 1e-9))
            mk = lambda n: jax.random.normal(key, (n, B, kin), jnp.bfloat16)
            us = marginal_us(lambda w_, xx: call_F(xx, w_, scales, bk, bn), qq, mk)
            gbs = (qq.size + scales.size * 4) / (us * 1e-6) / 1e9
            print(f"F bk={bk:5d} bn={bn:4d}: {us:7.1f} us  {gbs:5.0f} GB/s  relerr={err:.1e}")
        except Exception as e:
            print(f"F bk={bk:5d} bn={bn:4d}: FAIL {type(e).__name__} {str(e)[:160]}")


import os
part = os.environ.get("SWEEP_PART", "1")
if part == "1":
    run_shape("gate", 3584, 18944, 4,
              [("A", 1792, 512), ("B", 1792, 512), ("C", 1792, 512), ("B", 3584, 512)])
elif part == "2":
    run_shape("gate", 3584, 18944, 4,
              [("B", 1792, 1024), ("B", 896, 512), ("A", 1792, 1024)])
elif part == "3":
    run_shape("q", 3584, 3584, 4, [("B", 1792, 512), ("B", 3584, 512), ("A", 1792, 512)])
elif part == "4":
    run_shape("down", 18944, 3584, 4,
              [("B", 2368, 512), ("B", 1184, 512), ("A", 2368, 512)])
elif part == "6":
    run_F("gate", 3584, 18944, [(1792, 512), (3584, 512), (1792, 1024)])
elif part == "7":
    run_F("q", 3584, 3584, [(1792, 512), (3584, 512)])
    run_F("down", 18944, 3584, [(2368, 512)])
elif part == "5":
    run_shape("kv", 3584, 512, 4, [("B", 1792, 512), ("B", 3584, 512)])
    run_shape("gate8", 3584, 18944, 8, [("E", 1792, 512), ("E", 896, 512)])
