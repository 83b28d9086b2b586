"""Fused decode kernels: one batch-half's attention overlapped with the
other half's matmuls in a SINGLE pallas_call.

Why: a decode step at batch ≤128 is a serial chain per layer
(qkv → attention → o/mlp), so its two dominant costs cannot overlap as
separate ops — attention streams the KV cache (~HBM-bound, MXU idle) and
the weight matmuls occupy the MXU (DMA mostly idle with INT4 weights).
TPU executes ops serially and a pallas call's DMAs start with the op,
so the ONLY way to run attention DMA under matmul MXU work is inside one
kernel. Double-pumped decode (models/qwen.py::decode_step_pumped) splits
the batch into halves staggered by half a layer; with B > 128,
``ceil(B/128) == 2·ceil(B/2/128)`` so the split adds no MXU passes.

Kernels here, in measured order of usefulness (docs/PERF.md round-2 log):

* ``fused_mlp`` — single-pass SwiGLU (gate/up/silu/down, intermediates
  never touch HBM). Slightly faster than the 3-op path standalone; used
  by the main forward whenever the weights' pad-free INT4 layout allows.
* ``fused_attn_mlp`` — the production attention∥MLP kernel:
  homogeneous MLP F-tile cells with the KV stream hand-pipelined through
  a ``ring`` of VMEM slots (the automatic pipeline's one-cell lookahead
  stalls on a heterogeneous mix — measured). The ring DOES hide the KV
  DMA completely; the measured residual cost is the attention dots' MXU
  passes (M = G8 = 8 → 94% pass waste, inherent to GQA decode), which is
  why the pumped path's end-to-end win on v5e is capped — see PERF.md.
  Kept live behind ``pumped_supported`` (B > 128) where chips with a
  different pass:bandwidth ratio (v5p/v6e) can benefit.
* ``fused_attn_matmul`` — the first prototype (auto-pipelined interleave
  of attention blocks with one INT4 matmul); superseded by the manual
  ring but kept with its oracle test as the measured ablation.

Numerics are identical to ops/decode_attention.py (online softmax over
S-blocks of the stacked head-major cache, layer picked via scalar
prefetch) and ops/quant_matmul.py (plane-packed INT4, two mixed-input MXU
dots per plane-pair, post-dot group scales with excess-8 correction).

Reference lineage: the reference executes its per-layer kernels strictly
serially with a cudaDeviceSynchronize between launches (reference:
layers/src/qwen_main.cu:250-404) — no overlap exists there to copy; this
schedule is TPU-native by necessity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen_inference_engine_tpu.ops.decode_attention import (
    _flash_update,
    _NEG_INF,
)


def _fused_attn_matmul_kernel(
    lens_ref, layer_ref,
    # attention operands (half A)
    q_ref, k_ref, v_ref,
    # matmul operands (half B)
    xe_ref, xo_ref, w_ref, s_ref,
    # outputs
    attn_ref, y_ref,
    # scratch
    acc_att, m_att, l_att, acc_mm,
    *, na, nm, C, SB, KT, block_s, scale, n_kv, rpc, ppt, gs,
):
    c = pl.program_id(0)
    G8 = q_ref.shape[2]

    a_idx = c * na // C
    a_first = jnp.logical_or(c == 0, (c - 1) * na // C != a_idx)
    rb = a_idx // SB
    sb = a_idx % SB

    m_idx = c * nm // C
    m_first = jnp.logical_or(c == 0, (c - 1) * nm // C != m_idx)
    kt = m_idx % KT

    # ---- attention block (half A) ----
    @pl.when(jnp.logical_and(a_first, sb == 0))
    def _():
        acc_att[:] = jnp.zeros_like(acc_att)
        m_att[:] = jnp.full_like(m_att, _NEG_INF)
        l_att[:] = jnp.zeros_like(l_att)

    @pl.when(a_first)
    def _():
        for r in range(rpc):
            length = lens_ref[rb * rpc + r]

            @pl.when(sb * block_s < length)
            def _(r=r, length=length):
                kpos = sb * block_s + jax.lax.broadcasted_iota(
                    jnp.int32, (G8, block_s), dimension=1)
                valid = kpos < length
                for h in range(n_kv):
                    q = q_ref[r, h]
                    k = k_ref[0, r, h]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    s = jnp.where(valid, s, _NEG_INF)
                    _flash_update(s, v_ref[0, r, h], None, r * n_kv + h, G8,
                                  acc_att, m_att, l_att)

        @pl.when(sb == SB - 1)
        def _():
            denom = jnp.maximum(l_att[:], 1e-30)
            attn_ref[:] = (acc_att[:] / denom).reshape(
                attn_ref.shape).astype(attn_ref.dtype)

    # ---- matmul k-tile (half B) — INT4 plane-packed mixed dots ----
    @pl.when(m_first)
    def _():
        @pl.when(kt == 0)
        def _():
            acc_mm[:] = jnp.zeros_like(acc_mm)

        acc = acc_mm[:]
        for p in range(ppt):
            sl = slice(p * gs, (p + 1) * gs)
            b = w_ref[0, sl].astype(jnp.int32)
            l8 = jnp.bitwise_and(b, 0xF)
            lo = l8.astype(jnp.int8)
            hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
            xe = xe_ref[:, sl]
            pe = jax.lax.dot_general(xe, lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            po = jax.lax.dot_general(xo_ref[:, sl], hi,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sxe = jnp.sum(xe.astype(jnp.float32), axis=1, keepdims=True) * 8.0
            acc = acc + (pe - sxe) * s_ref[0, 0, p, 0:1, :] \
                      + po * s_ref[0, 0, p, 1:2, :]
        acc_mm[:] = acc

        @pl.when(kt == KT - 1)
        def _():
            y_ref[:] = acc_mm[:].astype(y_ref.dtype)


# ----------------------------------------------------------------------
# Production kernel: attention(half A) ∥ single-pass MLP(half B).
#
# The MLP streams gate/up/down weight tiles ONCE over the FFN axis:
# for each F-tile t: g = x@Wg[:,t], u = x@Wu[:,t], h = silu(g)*u,
# acc += h @ Wd[t,:] — no [M, F] intermediate ever touches HBM. Attention
# (row-block, s-block) units interleave on the same flat grid so the KV
# stream rides under the MLP's MXU passes.
# ----------------------------------------------------------------------

def _fused_attn_mlp_kernel(
    lens_ref, layer_a_ref, layer_m_ref,
    q_ref, kc_ref, vc_ref,                   # kc/vc: full stacked caches (HBM)
    x_ref, wg_ref, wu_ref, wd_ref,
    sg_ref, su_ref, sd_ref,
    attn_ref, y_ref,
    acc_att, m_att, l_att, s_all, acc_mm, kbuf, vbuf, sem,
    *, na, nm, SB, block_s, scale, n_kv, rpc, gs, gsd, kp, bn, row0, ring,
    upc, skip_attn_compute=False,
):
    c = pl.program_id(0)
    G8 = q_ref.shape[2]
    la = layer_a_ref[0]
    bs = block_s
    D = q_ref.shape[3]

    # ---- manual double-buffered KV stream (ring of `ring` block slots):
    # the auto pipeline's lookahead is one cell, which stalls on the
    # heterogeneous attention/matmul mix (measured: zero net overlap);
    # issuing the copies ourselves keeps `ring` KV blocks in flight under
    # the MLP's MXU passes.
    def kv_copies(u, slot):
        rb = u // SB
        sb = u % SB
        rows = pl.ds(row0 + rb * rpc, rpc)
        sbl = pl.ds(sb * bs, bs)
        return (
            pltpu.make_async_copy(kc_ref.at[la, rows, :, sbl, :],
                                  kbuf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(vc_ref.at[la, rows, :, sbl, :],
                                  vbuf.at[slot], sem.at[slot, 1]),
        )

    def issue(u):
        for cp in kv_copies(u, u % ring):
            cp.start()

    @pl.when(c == 0)
    def _():
        acc_mm[:] = jnp.zeros_like(acc_mm)
        for j in range(min(ring, na)):
            issue(jnp.int32(j))

    # ---- attention units assigned to this cell: [c·na/nm, (c+1)·na/nm)
    start_u = c * na // nm
    end_u = (c + 1) * na // nm

    def process(u):
        rb = u // SB
        sb = u % SB
        slot = u % ring

        @pl.when(sb == 0)
        def _():
            acc_att[:] = jnp.zeros_like(acc_att)
            m_att[:] = jnp.full_like(m_att, _NEG_INF)
            l_att[:] = jnp.zeros_like(l_att)

        for cp in kv_copies(u, slot):
            cp.wait()

        if not skip_attn_compute:       # diagnostic ablation (probe only)
            # batched online-softmax: scores for ALL (row, head) pairs land
            # in one [rpc·Hk·G8, bs] block so the state update (max, exp,
            # rescale) runs as a handful of wide VPU ops instead of
            # rpc·Hk narrow per-head updates (the measured ~2 us/unit
            # fixed cost of the per-head form)
            kpos = sb * bs + jax.lax.broadcasted_iota(
                jnp.int32, (G8, bs), dimension=1)
            for r in range(rpc):
                valid = kpos < lens_ref[rb * rpc + r]
                for h in range(n_kv):
                    q = q_ref[rb * rpc + r, h]           # [G8, D]
                    k = kbuf[slot, r, h]                 # [bs, D]
                    sc = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    sl = slice((r * n_kv + h) * G8, (r * n_kv + h + 1) * G8)
                    s_all[sl] = jnp.where(valid, sc, _NEG_INF)
            m_prev = m_att[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s_all[:], axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pr = jnp.exp(s_all[:] - m_new)
            l_att[:] = l_att[:] * alpha + jnp.sum(pr, axis=1, keepdims=True)
            m_att[:] = m_new
            pb = pr.astype(jnp.bfloat16)
            acc_att[:] = acc_att[:] * alpha
            for r in range(rpc):
                for h in range(n_kv):
                    sl = slice((r * n_kv + h) * G8, (r * n_kv + h + 1) * G8)
                    acc_att[sl] = acc_att[sl] + jax.lax.dot_general(
                        pb[sl], vbuf[slot, r, h], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        @pl.when(u + ring < na)
        def _():
            issue(u + ring)

        @pl.when(sb == SB - 1)
        def _():
            denom = jnp.maximum(l_att[:], 1e-30)
            out = (acc_att[:] / denom).reshape(rpc, n_kv, G8, D)
            attn_ref[pl.ds(rb * rpc, rpc)] = out.astype(attn_ref.dtype)

    for j in range(upc):
        u = start_u + j

        @pl.when(u < end_u)
        def _(u=u):
            process(u)

    # ---- this cell's F-tile of the MLP (every cell does exactly one) ----
    def int4_dot_k(xe, xo, w_ref, s_ref):
        """x @ W for a [K, bn] packed tile (kp plane-pairs along K)."""
        acc = None
        for p in range(kp):
            sl = slice(p * gs, (p + 1) * gs)
            b = w_ref[0, sl].astype(jnp.int32)
            l8 = jnp.bitwise_and(b, 0xF)
            lo = l8.astype(jnp.int8)
            hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
            xep = xe[:, sl]
            pe = jax.lax.dot_general(xep, lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            po = jax.lax.dot_general(xo[:, sl], hi,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sxe = jnp.sum(xep.astype(jnp.float32), axis=1,
                          keepdims=True) * 8.0
            t = (pe - sxe) * s_ref[0, p, 0:1, :] \
                + po * s_ref[0, p, 1:2, :]
            acc = t if acc is None else acc + t
        return acc

    xe = x_ref[0]
    xo = x_ref[1]
    g = int4_dot_k(xe, xo, wg_ref, sg_ref)
    u_ = int4_dot_k(xe, xo, wu_ref, su_ref)
    h = (g * jax.lax.logistic(g)) * u_                   # silu(g)·u, f32
    # down tile: bn logical rows = bn/(2·gsd) plane-pairs of Wd;
    # parity-split h on the fly (group 2q -> lo nibbles, 2q+1 -> hi)
    hb = h.astype(jnp.bfloat16)
    acc = acc_mm[:]
    for pq in range(bn // (2 * gsd)):
        he = hb[:, (2 * pq) * gsd:(2 * pq + 1) * gsd]
        ho = hb[:, (2 * pq + 1) * gsd:(2 * pq + 2) * gsd]
        b = wd_ref[0, pq * gsd:(pq + 1) * gsd].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo = l8.astype(jnp.int8)
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        pe = jax.lax.dot_general(he, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        po = jax.lax.dot_general(ho, hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sxe = jnp.sum(he.astype(jnp.float32), axis=1, keepdims=True) * 8.0
        acc = acc + (pe - sxe) * sd_ref[0, pq, 0:1, :] \
                  + po * sd_ref[0, pq, 1:2, :]
    acc_mm[:] = acc

    @pl.when(c == nm - 1)
    def _():
        y_ref[:] = acc_mm[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "gs_gate", "gs_down", "block_n", "block_s", "row0", "ring",
    "skip_attn_compute"))
def fused_attn_mlp(lens, layer_a, layer_m, q8, k_cache, v_cache, x,
                   wg, sg, wu, su, wd, sd, *,
                   scale, gs_gate, gs_down, block_n, block_s=256, row0=0,
                   ring=6, skip_attn_compute=False):
    """Flash decode attention for cache rows [row0, row0+Ba) at layer
    ``layer_a``, fused with the complete MLP ``down(silu(gate(x))·up(x))``
    of layer ``layer_m`` for the independent half ``x``.

    Grid = MLP F-tiles (homogeneous ~7 µs MXU cells); the KV stream is
    hand-pipelined through a ``ring``-slot VMEM buffer so up to ``ring``
    blocks are in flight while the MXU crunches — see the module docstring
    for why the automatic pipeline cannot do this.

    q8 [Ba, Hk, G8, D]; k/v_cache [L, B, Hk, S, D]; x [Mb, K] bf16;
    wg/wu [L, K/2, F] packed INT4 (+ scales [L, K/gs_gate, F]);
    wd [L, F/2, K] packed INT4 (+ scales [L, F/gs_down, K]).
    Returns (attn [Ba, Hk, G8, D], mlp_out [Mb, K]).
    """
    Ba, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    m, k = x.shape
    L = wg.shape[0]
    F = wg.shape[2]
    bn = block_n
    bs = block_s
    assert F % bn == 0 and S % bs == 0 and bn % (2 * gs_down) == 0
    assert k % (2 * gs_gate) == 0
    kp = k // (2 * gs_gate)
    SB = S // bs
    rpc = 2 if Ba % 2 == 0 else 1
    RB = Ba // rpc
    na = RB * SB
    nm = F // bn
    upc = na // nm + 1

    # gate/up consume x parity-split by gs_gate groups; stack [2, m, k/2]
    xm = x.astype(jnp.bfloat16).reshape(m, k // (2 * gs_gate), 2, gs_gate)
    xs = jnp.stack([xm[:, :, 0, :].reshape(m, k // 2),
                    xm[:, :, 1, :].reshape(m, k // 2)])
    sg5 = sg.reshape(L, kp, 2, F)
    su5 = su.reshape(L, kp, 2, F)
    sd5 = sd.reshape(L, F // (2 * gs_down), 2, k)

    def w_col(c, lens_ref, la_ref, lm_ref):     # wg/wu tile [1, k/2, bn]
        return (lm_ref[0], 0, c)

    def s_col(c, lens_ref, la_ref, lm_ref):
        return (lm_ref[0], 0, 0, c)

    def w_down(c, lens_ref, la_ref, lm_ref):    # wd tile [1, bn/2, k]
        return (lm_ref[0], c, 0)

    def s_down(c, lens_ref, la_ref, lm_ref):
        return (lm_ref[0], c, 0, 0)

    const = lambda c, *_: tuple(0 for _ in range(3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((Ba, Hk, G8, D),
                         lambda c, *_: (0, 0, 0, 0)),          # q (whole)
            pl.BlockSpec(memory_space=pl.ANY),                 # k_cache
            pl.BlockSpec(memory_space=pl.ANY),                 # v_cache
            pl.BlockSpec((2, m, k // 2), const),               # x planes
            pl.BlockSpec((1, k // 2, bn), w_col),              # wg
            pl.BlockSpec((1, k // 2, bn), w_col),              # wu
            pl.BlockSpec((1, bn // 2, k), w_down),             # wd
            pl.BlockSpec((1, kp, 2, bn), s_col),               # sg
            pl.BlockSpec((1, kp, 2, bn), s_col),               # su
            pl.BlockSpec((1, bn // (2 * gs_down), 2, k), s_down),  # sd
        ],
        out_specs=(
            pl.BlockSpec((Ba, Hk, G8, D), lambda c, *_: (0, 0, 0, 0)),
            pl.BlockSpec((m, k), lambda c, *_: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((rpc * Hk * G8, D), jnp.float32),
            pltpu.VMEM((rpc * Hk * G8, 1), jnp.float32),
            pltpu.VMEM((rpc * Hk * G8, 1), jnp.float32),
            pltpu.VMEM((rpc * Hk * G8, bs), jnp.float32),
            pltpu.VMEM((m, k), jnp.float32),
            pltpu.VMEM((ring, rpc, Hk, bs, D), k_cache.dtype),
            pltpu.VMEM((ring, rpc, Hk, bs, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((ring, 2)),
        ],
    )
    kernel = functools.partial(
        _fused_attn_mlp_kernel, na=na, nm=nm, SB=SB, block_s=bs,
        scale=scale, n_kv=Hk, rpc=rpc, gs=gs_gate, gsd=gs_down, kp=kp,
        bn=bn, row0=row0, ring=ring, upc=upc,
        skip_attn_compute=skip_attn_compute)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Ba, Hk, G8, D), q8.dtype),
            jax.ShapeDtypeStruct((m, k), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Ba * Hk * G8 * S * D + 6 * m * F * k,
            bytes_accessed=2 * Ba * Hk * S * D * k_cache.dtype.itemsize
            + 3 * (k // 2) * F,
            transcendentals=Ba * Hk * G8 * S + m * F,
        ),
    )(lens, layer_a, layer_m, q8, k_cache, v_cache, xs,
      wg, wu, wd, sg5, su5, sd5)


@functools.partial(jax.jit, static_argnames=(
    "scale", "group_size", "block_n", "block_s", "ppt", "row0"))
def fused_attn_matmul(lens, layer, q8, k_cache, v_cache, x, wq, wscales, *,
                      scale, group_size, block_n, block_s=1024, ppt=1,
                      row0=0):
    """Attention for rows [row0, row0+Ba) of the stacked cache, fused with
    ``y = x @ dequant(wq[layer])``.

    q8: [Ba, Hk, G8, D]; k/v_cache: [L, B, Hk, S, D]; lens: [Ba];
    x: [Mb, K] bf16; wq: [L, K/2, N] packed INT4; wscales: [L, K/gs, N].
    Returns (attn [Ba, Hk, G8, D], y [Mb, N]).
    """
    Ba, Hk, G8, D = q8.shape
    S = k_cache.shape[3]
    m, k = x.shape
    L, _, n = wq.shape
    gs = group_size
    bk = 2 * gs * ppt
    assert k % bk == 0 and n % block_n == 0 and S % block_s == 0
    KT = k // bk
    NT = n // block_n
    bs = block_s
    SB = S // bs
    rpc = 2 if Ba % 2 == 0 else 1
    RB = Ba // rpc
    na = RB * SB
    nm = NT * KT
    C = max(na, nm)

    # parity-split x (even/odd scale groups -> lo/hi nibble planes)
    xm = x.reshape(m, k // (2 * gs), 2, gs)
    xe = xm[:, :, 0, :].reshape(m, k // 2)
    xo = xm[:, :, 1, :].reshape(m, k // 2)
    scales5 = wscales.reshape(L, KT, ppt, 2, n)

    def attn_rb(c, lens_ref, layer_ref):
        return ((c * na // C) // SB, 0, 0, 0)

    def kv_index(c, lens_ref, layer_ref):
        a_idx = c * na // C
        rb, sb = a_idx // SB, a_idx % SB
        last = jnp.int32(0)
        for r in range(rpc):
            last = jnp.maximum(last, lens_ref[rb * rpc + r] - 1)
        return (layer_ref[0], row0 // rpc + rb, 0,
                jnp.minimum(sb, jnp.maximum(last, 0) // bs), 0)

    def mm_x(c, lens_ref, layer_ref):
        return (0, (c * nm // C) % KT)

    def mm_w(c, lens_ref, layer_ref):
        m_idx = c * nm // C
        return (layer_ref[0], m_idx % KT, m_idx // KT)

    def mm_s(c, lens_ref, layer_ref):
        m_idx = c * nm // C
        return (layer_ref[0], m_idx % KT, 0, 0, m_idx // KT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((rpc, Hk, G8, D), attn_rb),          # q (by row blk)
            pl.BlockSpec((1, rpc, Hk, bs, D), kv_index),      # k
            pl.BlockSpec((1, rpc, Hk, bs, D), kv_index),      # v
            pl.BlockSpec((m, ppt * gs), mm_x),                # xe
            pl.BlockSpec((m, ppt * gs), mm_x),                # xo
            pl.BlockSpec((1, ppt * gs, block_n), mm_w),       # wq
            pl.BlockSpec((1, 1, ppt, 2, block_n), mm_s),      # scales
        ],
        out_specs=(
            pl.BlockSpec((rpc, Hk, G8, D), attn_rb),
            pl.BlockSpec((m, block_n),
                         lambda c, lens, layer: (0, (c * nm // C) // KT)),
        ),
        scratch_shapes=[
            pltpu.VMEM((rpc * Hk * G8, D), jnp.float32),
            pltpu.VMEM((rpc * Hk * G8, 1), jnp.float32),
            pltpu.VMEM((rpc * Hk * G8, 1), jnp.float32),
            pltpu.VMEM((m, block_n), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fused_attn_matmul_kernel, na=na, nm=nm, C=C, SB=SB, KT=KT,
        block_s=bs, scale=scale, n_kv=Hk, rpc=rpc, ppt=ppt, gs=gs)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Ba, Hk, G8, D), q8.dtype),
            jax.ShapeDtypeStruct((m, n), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Ba * Hk * G8 * S * D + 2 * m * n * k,
            bytes_accessed=2 * Ba * Hk * S * D * k_cache.dtype.itemsize
            + (k // 2) * n + m * k * 2,
            transcendentals=Ba * Hk * G8 * S,
        ),
    )(lens, layer, q8, k_cache, v_cache, xe, xo, wq, scales5)

# ----------------------------------------------------------------------
# Standalone single-pass MLP kernel (no attention interleave): one grid
# over F-tiles computing down(silu(gate(x))·up(x)) with gate/up/down
# weight tiles streamed once — the [M, F] gate/up/h intermediates never
# touch HBM (three separate matmul ops round-trip ~22 MB/layer of bf16
# activations at M=96, ~0.75 ms/step at 7B).
# ----------------------------------------------------------------------

def _fused_mlp_kernel(layer_ref, x_ref, wg_ref, wu_ref, wd_ref,
                      sg_ref, su_ref, sd_ref, y_ref, acc_mm,
                      *, nm, gs, gsd, kp, bn):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_mm[:] = jnp.zeros_like(acc_mm)

    def int4_dot_k(xe, xo, w_ref, s_ref):
        acc = None
        for pp in range(kp):
            sl = slice(pp * gs, (pp + 1) * gs)
            b = w_ref[0, sl].astype(jnp.int32)
            l8 = jnp.bitwise_and(b, 0xF)
            lo = l8.astype(jnp.int8)
            hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
            xep = xe[:, sl]
            pe = jax.lax.dot_general(xep, lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            po = jax.lax.dot_general(xo[:, sl], hi,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sxe = jnp.sum(xep.astype(jnp.float32), axis=1,
                          keepdims=True) * 8.0
            t = (pe - sxe) * s_ref[0, pp, 0:1, :] \
                + po * s_ref[0, pp, 1:2, :]
            acc = t if acc is None else acc + t
        return acc

    xe = x_ref[0]
    xo = x_ref[1]
    g = int4_dot_k(xe, xo, wg_ref, sg_ref)
    u_ = int4_dot_k(xe, xo, wu_ref, su_ref)
    h = (g * jax.lax.logistic(g)) * u_
    hb = h.astype(jnp.bfloat16)
    acc = acc_mm[:]
    for pq in range(bn // (2 * gsd)):
        he = hb[:, (2 * pq) * gsd:(2 * pq + 1) * gsd]
        ho = hb[:, (2 * pq + 1) * gsd:(2 * pq + 2) * gsd]
        b = wd_ref[0, pq * gsd:(pq + 1) * gsd].astype(jnp.int32)
        l8 = jnp.bitwise_and(b, 0xF)
        lo = l8.astype(jnp.int8)
        hi = jnp.right_shift(b - l8, 4).astype(jnp.int8)
        pe = jax.lax.dot_general(he, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        po = jax.lax.dot_general(ho, hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sxe = jnp.sum(he.astype(jnp.float32), axis=1, keepdims=True) * 8.0
        acc = acc + (pe - sxe) * sd_ref[0, pq, 0:1, :] \
                  + po * sd_ref[0, pq, 1:2, :]
    acc_mm[:] = acc

    @pl.when(c == nm - 1)
    def _():
        y_ref[:] = acc_mm[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "gs_gate", "gs_down", "block_n"))
def fused_mlp(x, wg, sg, wu, su, wd, sd, layer, *,
              gs_gate, gs_down, block_n=512):
    """x [M, K] @ the whole SwiGLU MLP of layer ``layer``; returns [M, K].

    Same weight layouts as fused_attn_mlp (pad-free INT4: gate/up
    [L, K/2, F], down [L, F/2, K])."""
    m, k = x.shape
    L = wg.shape[0]
    F = wg.shape[2]
    bn = block_n
    assert F % bn == 0 and bn % (2 * gs_down) == 0
    assert k % (2 * gs_gate) == 0
    kp = k // (2 * gs_gate)
    nm = F // bn

    xm = x.astype(jnp.bfloat16).reshape(m, k // (2 * gs_gate), 2, gs_gate)
    xs = jnp.stack([xm[:, :, 0, :].reshape(m, k // 2),
                    xm[:, :, 1, :].reshape(m, k // 2)])
    sg5 = sg.reshape(L, kp, 2, F)
    su5 = su.reshape(L, kp, 2, F)
    sd5 = sd.reshape(L, F // (2 * gs_down), 2, k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((2, m, k // 2), lambda c, *_: (0, 0, 0)),
            pl.BlockSpec((1, k // 2, bn), lambda c, lr: (lr[0], 0, c)),
            pl.BlockSpec((1, k // 2, bn), lambda c, lr: (lr[0], 0, c)),
            pl.BlockSpec((1, bn // 2, k), lambda c, lr: (lr[0], c, 0)),
            pl.BlockSpec((1, kp, 2, bn), lambda c, lr: (lr[0], 0, 0, c)),
            pl.BlockSpec((1, kp, 2, bn), lambda c, lr: (lr[0], 0, 0, c)),
            pl.BlockSpec((1, bn // (2 * gs_down), 2, k),
                         lambda c, lr: (lr[0], c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m, k), lambda c, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((m, k), jnp.float32)],
    )
    kernel = functools.partial(_fused_mlp_kernel, nm=nm, gs=gs_gate,
                               gsd=gs_down, kp=kp, bn=bn)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * F * k,
            bytes_accessed=3 * (k // 2) * F + m * k * 4,
            transcendentals=m * F,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, wg, wu, wd,
      sg5, su5, sd5)


def fused_mlp_supported(gate, up, down, m: int) -> bool:
    """Pad-free INT4 triple with matching shapes (see fused_mlp)."""
    from qwen_inference_engine_tpu.ops.linear import QuantLinear

    for lin in (gate, up, down):
        if not isinstance(lin, QuantLinear) or lin.bits != 4 \
                or lin.b is not None or lin.q.ndim != 3:
            return False
    F = gate.out_features
    if up.out_features != F or down.in_features != F:
        return False
    if F % 512 or 512 % (2 * down.group_size):
        return False
    if gate.group_size != up.group_size:
        return False
    if down.out_features % (2 * gate.group_size):
        return False
    return m <= 256

