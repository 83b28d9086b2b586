"""Measure roadmap #1: fused K+V page pool vs split pools.

The r4 finding: at page 512 the paged decode kernel costs ~2x the
contiguous kernel per step (28 layers, b96, S1408) and the gap is
per-page-DMA issue cost — split K/V pools pay two DMAs per page per
cell. Hypothesis: one pool [L, P, 2, Hk, page, D] (K at index 0, V at 1
along axis 2, contiguous per page in HBM) halves the DMA count.

Phase 1 checks fused-kernel math vs the production split kernel at
small shapes; phase 2 times split then fused at the headline shape
(pools are freed between phases — both don't fit in HBM together).

Usage: python scripts/probe_fused_pool.py [batch] [ctx] [page] [layers]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen_inference_engine_tpu.ops.paged_attention import (
    paged_decode_attention_stacked,
    paged_decode_attention_stacked_q8,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1408
PAGE = int(sys.argv[3]) if len(sys.argv) > 3 else 512
L = int(sys.argv[4]) if len(sys.argv) > 4 else 28
Hk, Hq, D = 4, 28, 128
_NEG_INF = -1e30


def _sync(o):
    # jax.block_until_ready returns EARLY through the axon tunnel
    # (.claude/skills/verify) — sync by fetching a value instead.
    np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]


def timed(fn, *args, reps=20):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        _sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


# ------------------------------------------------------------ fused kernel
def _fused_kernel(tables_ref, lens_ref, layer_ref, q_ref, *rest, scale,
                  page_size, n_kv, ppc):
    kv_refs = rest[:ppc]
    o_ref, acc_ref, m_ref, l_ref = rest[ppc:]
    b = pl.program_id(0)
    pt = pl.program_id(1)
    n_pt = pl.num_programs(1)
    GP = q_ref.shape[2]

    @pl.when(pt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]
    for c in range(ppc):
        base = (pt * ppc + c) * page_size

        @pl.when(base < seq_len)
        def _(c=c, base=base):
            k_pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (GP, page_size), 1)
            valid = k_pos < seq_len
            for h in range(n_kv):
                qh = q_ref[0, h]
                k = kv_refs[c][0, 0, 0, h]
                s = jax.lax.dot_general(
                    qh, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(valid, s, _NEG_INF)
                sl = slice(h * GP, (h + 1) * GP)
                m_prev = m_ref[sl]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[sl] = (l_ref[sl] * alpha
                             + jnp.sum(p, axis=1, keepdims=True))
                m_ref[sl] = m_new
                pv = jax.lax.dot_general(
                    p.astype(kv_refs[c].dtype), kv_refs[c][0, 0, 1, h],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(pt == n_pt - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).reshape(
            o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ppc", "page"))
def fused_attn(q, kv_pages, tables, lens, layer, ppc, page):
    Bq, _, Hqq, Dq = q.shape
    Hkk = kv_pages.shape[3]
    G = Hqq // Hkk
    GP = max(8, G)
    qh = q[:, 0].reshape(Bq, Hkk, G, Dq)
    if GP != G:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, GP - G), (0, 0)))
    pages_max = tables.shape[1]

    def kv_index(i):
        def f(b, pt, tables, lens, layer):
            last = jnp.maximum(lens[b] - 1, 0) // page
            return (layer[0], tables[b, jnp.minimum(pt * ppc + i, last)],
                    0, 0, 0, 0)
        return f

    kernel = functools.partial(_fused_kernel, scale=Dq ** -0.5,
                               page_size=page, n_kv=Hkk, ppc=ppc)
    page_spec = lambda i: pl.BlockSpec((1, 1, 2, Hkk, page, Dq),
                                       kv_index(i),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bq, -(-pages_max // ppc)),
        in_specs=[
            pl.BlockSpec((1, Hkk, GP, Dq),
                         lambda b, pt, tables, lens, layer: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [page_spec(i) for i in range(ppc)],
        out_specs=pl.BlockSpec((1, Hkk, GP, Dq),
                               lambda b, pt, tables, lens, layer:
                               (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkk * GP, Dq), jnp.float32),
            pltpu.VMEM((Hkk * GP, 1), jnp.float32),
            pltpu.VMEM((Hkk * GP, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bq, Hkk, GP, Dq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tables, lens, layer, qh, *([kv_pages] * ppc))
    return out[:, :, :G, :].reshape(Bq, 1, Hqq, Dq)


# ------------------------------------------------- multi-seq-per-cell split
def _mseq_kernel(tables_ref, lens_ref, layer_ref, q_ref, *rest, scale,
                 page_size, n_kv, ppc, nseq):
    k_refs = rest[: nseq * ppc]            # [s*ppc + c]
    v_refs = rest[nseq * ppc: 2 * nseq * ppc]
    o_ref, acc_ref, m_ref, l_ref = rest[2 * nseq * ppc:]
    g = pl.program_id(0)
    pt = pl.program_id(1)
    n_pt = pl.num_programs(1)
    GP = q_ref.shape[2]

    @pl.when(pt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    for s in range(nseq):
        seq_len = lens_ref[g * nseq + s]
        for c in range(ppc):
            base = (pt * ppc + c) * page_size

            @pl.when(base < seq_len)
            def _(s=s, c=c, base=base, seq_len=seq_len):
                k_pos = base + jax.lax.broadcasted_iota(
                    jnp.int32, (GP, page_size), 1)
                valid = k_pos < seq_len
                for h in range(n_kv):
                    qh = q_ref[s, h]
                    k = k_refs[s * ppc + c][0, 0, h]
                    sc = jax.lax.dot_general(
                        qh, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    sc = jnp.where(valid, sc, _NEG_INF)
                    sl = slice((s * n_kv + h) * GP,
                               (s * n_kv + h + 1) * GP)
                    m_prev = m_ref[sl]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(sc, axis=1, keepdims=True))
                    p = jnp.exp(sc - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    l_ref[sl] = (l_ref[sl] * alpha
                                 + jnp.sum(p, axis=1, keepdims=True))
                    m_ref[sl] = m_new
                    pv = jax.lax.dot_general(
                        p.astype(v_refs[s * ppc + c].dtype),
                        v_refs[s * ppc + c][0, 0, h],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[sl] = acc_ref[sl] * alpha + pv

    @pl.when(pt == n_pt - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[:] = (acc_ref[:] / denom).reshape(
            o_ref.shape).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ppc", "page", "nseq"))
def mseq_attn(q, k_pages, v_pages, tables, lens, layer, ppc, page, nseq):
    Bq, _, Hqq, Dq = q.shape
    Hkk = k_pages.shape[2]
    G = Hqq // Hkk
    GP = max(8, G)
    qh = q[:, 0].reshape(Bq, Hkk, G, Dq)
    if GP != G:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, GP - G), (0, 0)))
    pages_max = tables.shape[1]

    def kv_index(s, i):
        def f(g, pt, tables, lens, layer):
            b = g * nseq + s
            last = jnp.maximum(lens[b] - 1, 0) // page
            return (layer[0], tables[b, jnp.minimum(pt * ppc + i, last)],
                    0, 0, 0)
        return f

    kernel = functools.partial(_mseq_kernel, scale=Dq ** -0.5,
                               page_size=page, n_kv=Hkk, ppc=ppc,
                               nseq=nseq)
    page_spec = lambda s, i: pl.BlockSpec((1, 1, Hkk, page, Dq),
                                          kv_index(s, i),
                                          memory_space=pltpu.VMEM)
    refs = [page_spec(s, i) for s in range(nseq) for i in range(ppc)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bq // nseq, -(-pages_max // ppc)),
        in_specs=[
            pl.BlockSpec((nseq, Hkk, GP, Dq),
                         lambda g, pt, tables, lens, layer: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + refs + refs,
        out_specs=pl.BlockSpec((nseq, Hkk, GP, Dq),
                               lambda g, pt, tables, lens, layer:
                               (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nseq * Hkk * GP, Dq), jnp.float32),
            pltpu.VMEM((nseq * Hkk * GP, 1), jnp.float32),
            pltpu.VMEM((nseq * Hkk * GP, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bq, Hkk, GP, Dq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(tables, lens, layer, qh,
      *([k_pages] * (nseq * ppc)), *([v_pages] * (nseq * ppc)))
    return out[:, :, :G, :].reshape(Bq, 1, Hqq, Dq)


# ---------------------------------------------------------- phase 1: math
def correctness():
    Ls, Ps, page, ctx, Bs = 2, 24, 128, 300, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (Bs, 1, Hq, D), jnp.bfloat16)
    pps = -(-ctx // page) + 1
    tab = jnp.asarray(np.random.permutation(Ps)[: Bs * pps].reshape(Bs, pps),
                      jnp.int32)
    lens = jnp.asarray([ctx, 5, page, 2 * page + 7], jnp.int32)
    k = jax.random.normal(key, (Ls, Ps, Hk, page, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (Ls, Ps, Hk, page, D),
                          jnp.bfloat16)
    kv = jnp.stack([k, v], axis=2)
    worst = 0.0
    for layer in range(Ls):
        ref = paged_decode_attention_stacked(q, k, v, tab, lens, page, layer)
        for ppc in (1, 2, 3):
            got = fused_attn(q, kv, tab, lens,
                             jnp.asarray(layer, jnp.int32).reshape(1),
                             ppc, page)
            worst = max(worst, float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32)))))
    for layer in range(Ls):
        ref = paged_decode_attention_stacked(q, k, v, tab, lens, page, layer)
        for nseq, ppc in ((2, 1), (2, 2), (4, 3)):
            got = mseq_attn(q, k, v, tab, lens,
                            jnp.asarray(layer, jnp.int32).reshape(1),
                            ppc, page, nseq)
            worst = max(worst, float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32)))))
    print(f"phase1 correctness: max|err| = {worst:.2e}", flush=True)
    assert worst < 2e-2


# --------------------------------------------------------- phase 2: timing
def layer_sweep_split(q, k, v, tab, lens, page):
    def body(layer, acc):
        o = paged_decode_attention_stacked(q, k, v, tab, lens, page, layer)
        return acc + o.astype(jnp.float32)
    return jax.lax.fori_loop(0, L, body,
                             jnp.zeros(q.shape, jnp.float32))


def layer_sweep_fused(q, kv, tab, lens, ppc, page):
    def body(layer, acc):
        o = fused_attn(q, kv, tab, lens,
                       jnp.asarray(layer, jnp.int32).reshape(1), ppc, page)
        return acc + o.astype(jnp.float32)
    return jax.lax.fori_loop(0, L, body,
                             jnp.zeros(q.shape, jnp.float32))


def main():
    correctness()

    pps = -(-(CTX + 64) // PAGE)
    P = B * pps + 8
    hbm_gb = L * P * Hk * PAGE * D * 2 * 2 / 2**30
    print(f"phase2 b{B} ctx{CTX} page{PAGE} L{L} pages/seq={pps} "
          f"pool={P} ({hbm_gb:.1f} GB) on "
          f"{jax.devices()[0].device_kind}", flush=True)

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
    tab = jnp.asarray(
        np.random.permutation(P)[: B * pps].reshape(B, pps), jnp.int32)
    # sequential layout: sequence b owns pages [b*pps, (b+1)*pps)
    tab_seq = jnp.asarray(
        np.arange(B * pps).reshape(B, pps), jnp.int32)
    lens = jnp.full((B,), CTX, jnp.int32)

    # --- split
    k = jax.random.normal(key, (L, P, Hk, PAGE, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (L, P, Hk, PAGE, D),
                          jnp.bfloat16)
    jax.block_until_ready((k, v))
    split_fn = jax.jit(functools.partial(layer_sweep_split, page=PAGE))
    dt = timed(split_fn, q, k, v, tab, lens)
    bw = hbm_gb / dt
    print(f"split pools ({L} layers):   {dt*1e3:7.2f} ms  "
          f"({bw:.0f} GB/s effective)", flush=True)
    dt = timed(split_fn, q, k, v, tab_seq, lens)
    bw = hbm_gb / dt
    print(f"split SEQUENTIAL tables:    {dt*1e3:7.2f} ms  "
          f"({bw:.0f} GB/s effective)", flush=True)
    # --- multi-sequence cells (same split pools)
    for nseq, ppc in ((2, 1), (2, 3), (4, 1), (4, 3)):
        if B % nseq or ppc > pps:
            continue
        vmem_mb = nseq * ppc * 2 * Hk * PAGE * D * 2 * 2 / 2**20
        def sweep(q, k, v, tab, lens, nseq=nseq, ppc=ppc):
            def body(layer, acc):
                o = mseq_attn(q, k, v, tab, lens,
                              jnp.asarray(layer, jnp.int32).reshape(1),
                              ppc, PAGE, nseq)
                return acc + o.astype(jnp.float32)
            return jax.lax.fori_loop(0, L, body,
                                     jnp.zeros(q.shape, jnp.float32))
        try:
            dt = timed(jax.jit(sweep), q, k, v, tab, lens)
            bw = hbm_gb / dt
            print(f"mseq n={nseq} ppc={ppc} ({vmem_mb:.0f}MB 2xbuf): "
                  f"{dt*1e3:7.2f} ms  ({bw:.0f} GB/s effective)",
                  flush=True)
        except Exception as e:
            print(f"mseq n={nseq} ppc={ppc}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    del k, v

    # --- INT8-KV (the serving configuration): same shape, int8 pools +
    # fp32 scale slabs. Bytes halve but each page now costs SIX DMAs
    # (k, v, k_scale, v_scale x ppc refs) — if per-DMA issue cost is the
    # wall, this should run far above its bytes-floor.
    k8 = jax.random.randint(key, (L, P, Hk, PAGE, D), -127, 127, jnp.int8)
    v8 = jax.random.randint(key, (L, P, Hk, PAGE, D), -127, 127, jnp.int8)
    ks = jnp.full((L, P, Hk, PAGE), 0.01, jnp.float32)
    vs = jnp.full((L, P, Hk, PAGE), 0.01, jnp.float32)
    jax.block_until_ready((k8, v8, ks, vs))
    q8_gb = (2 * L * P * Hk * PAGE * D + 2 * 4 * L * P * Hk * PAGE) / 2**30

    def sweep_q8(q, k8, v8, ks, vs, tab, lens):
        def body(layer, acc):
            o = paged_decode_attention_stacked_q8(
                q, k8, v8, ks, vs, tab, lens, PAGE, layer)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros(q.shape, jnp.float32))

    dt = timed(jax.jit(sweep_q8), q, k8, v8, ks, vs, tab, lens)
    print(f"q8 split ({L} layers):      {dt*1e3:7.2f} ms  "
          f"({q8_gb/dt:.0f} GB/s effective, {q8_gb:.1f} GB)", flush=True)
    del k8, v8, ks, vs

    # --- fused
    kv = jax.random.normal(key, (L, P, 2, Hk, PAGE, D), jnp.bfloat16)
    jax.block_until_ready(kv)
    for ppc in (1, 2, 3, 4):
        if ppc > pps:
            break
        fn = jax.jit(functools.partial(layer_sweep_fused, ppc=ppc,
                                       page=PAGE))
        dt = timed(fn, q, kv, tab, lens)
        bw = hbm_gb / dt
        print(f"fused ppc={ppc} ({L} layers):  {dt*1e3:7.2f} ms  "
              f"({bw:.0f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
