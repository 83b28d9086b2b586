"""Pallas attention kernels vs the XLA oracle (interpreter mode on CPU).

flash_attention (prefill) and paged_decode_attention must reproduce
ops.attention.gqa_attention bit-for-nearly-bit; compiled-mode equivalence
is exercised on the real chip by examples/generate.py and bench.py."""

import contextlib
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.ops.attention import (
    gqa_attention,
    gqa_attention_kmajor,
)
from qwen_inference_engine_tpu.kvcache.cache import paged_read, paged_write


@contextlib.contextmanager
def interpret_pallas(module):
    orig = module.pl.pallas_call

    def call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(module.pl, "pallas_call", call):
        yield


@pytest.mark.parametrize("T,Hq,Hk", [(32, 4, 2), (64, 8, 8), (128, 10, 2)])
def test_flash_attention_matches_oracle(T, Hq, Hk):
    import qwen_inference_engine_tpu.ops.flash_attention as fa

    B, D = 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hk, D)).astype(np.float32))
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    oracle = gqa_attention(q, k, v, positions)
    assert fa.flash_attention_supported(q.shape, k.shape)
    with interpret_pallas(fa):
        got = fa.flash_attention(q, k, v, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("G,page_size", [(2, 8), (7, 16), (1, 8)])
def test_paged_decode_attention_matches_oracle(G, page_size):
    import qwen_inference_engine_tpu.ops.paged_attention as pa

    B, Hk, D = 3, 2, 128
    Hq = G * Hk
    max_pages = 4
    P = B * max_pages + 1
    rng = np.random.default_rng(1)
    lens = jnp.asarray([5, page_size * 2, page_size * 3 - 1], jnp.int32)

    pages_k = jnp.zeros((P, Hk, page_size, D), jnp.float32)
    pages_v = jnp.zeros((P, Hk, page_size, D), jnp.float32)
    tables = jnp.asarray(
        [[1 + b * max_pages + i for i in range(max_pages)] for b in range(B)],
        jnp.int32)

    # fill caches at positions 0..len-1 via paged_write
    S = max_pages * page_size
    kfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    vfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    pages_k = paged_write(pages_k, kfull, pos, tables, page_size)
    pages_v = paged_write(pages_v, vfull, pos, tables, page_size)

    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    # oracle over the gathered view with causal position len-1
    k_view = paged_read(pages_k, tables)   # head-major [B, Hk, S, D]
    v_view = paged_read(pages_v, tables)
    oracle = gqa_attention_kmajor(q, k_view, v_view, (lens - 1)[:, None])

    assert pa.paged_attention_supported(D, page_size)
    with interpret_pallas(pa):
        got = pa.paged_decode_attention(q, pages_k, pages_v, tables, lens,
                                        page_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)


def test_paged_kernel_ignores_stale_pages():
    """Garbage beyond seq_len (scratch page reuse) must not leak in."""
    import qwen_inference_engine_tpu.ops.paged_attention as pa

    B, Hk, G, D, page_size = 1, 1, 1, 128, 8
    P = 4
    rng = np.random.default_rng(2)
    pages_k = jnp.asarray(rng.normal(size=(P, Hk, page_size, D)).astype(np.float32)) * 100
    pages_v = jnp.asarray(rng.normal(size=(P, Hk, page_size, D)).astype(np.float32)) * 100
    tables = jnp.asarray([[1, 2]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)  # only 3 tokens valid, page 2 stale
    q = jnp.asarray(rng.normal(size=(B, 1, G * Hk, D)).astype(np.float32))

    k_view = paged_read(pages_k, tables)   # head-major [B, Hk, S, D]
    v_view = paged_read(pages_v, tables)
    oracle = gqa_attention_kmajor(q, k_view, v_view, (lens - 1)[:, None])
    with interpret_pallas(pa):
        got = pa.paged_decode_attention(q, pages_k, pages_v, tables, lens,
                                        page_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("B,G", [(2, 7), (3, 4)])
def test_contiguous_decode_attention_matches_oracle(B, G):
    """Stacked-cache flash decode kernel vs the XLA oracle."""
    import qwen_inference_engine_tpu.ops.decode_attention as da

    L, Hk, D, S = 3, 2, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(7)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, S, size=(B,)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    layer = 1

    assert da.decode_attention_supported(D, S, Hq, Hk)
    with interpret_pallas(da):
        got = da.decode_attention_contiguous(q, kc, vc, layer, lens)
    oracle = gqa_attention_kmajor(q, kc[layer], vc[layer], (lens - 1)[:, None],
                                  kv_valid_len=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("pos", [0, 5, 8, 63])
def test_kv_append_uniform_matches_scatter(pos):
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.kvcache.cache import contiguous_write_stacked

    L, B, Hk, S, D = 2, 3, 2, 64, 128
    rng = np.random.default_rng(8)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    knew = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    vnew = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    layer = 1
    posv = jnp.full((B, 1), pos, jnp.int32)

    ref_k = contiguous_write_stacked(kc, jnp.int32(layer), knew, posv)
    ref_v = contiguous_write_stacked(vc, jnp.int32(layer), vnew, posv)
    with interpret_pallas(ka):
        got_k, got_v = ka.kv_append_uniform(kc, vc, knew, vnew,
                                            jnp.int32(pos), layer)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_contiguous_decode_attention_q8_matches_oracle():
    """INT8-KV flash decode kernel vs dequantize-then-attend oracle."""
    import qwen_inference_engine_tpu.ops.decode_attention as da
    from qwen_inference_engine_tpu.quant.kv_quant import dequantize_kv, quantize_kv

    L, B, Hk, G, D, S = 2, 2, 2, 7, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(11)
    kf = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    lens = jnp.asarray([100, 256], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    layer = 1

    with interpret_pallas(da):
        got = da.decode_attention_contiguous_q8(q, kq, vq, ks, vs, layer, lens)
    k_deq = dequantize_kv(kq[layer], ks[layer], jnp.float32)
    v_deq = dequantize_kv(vq[layer], vs[layer], jnp.float32)
    oracle = gqa_attention_kmajor(q, k_deq, v_deq, (lens - 1)[:, None],
                                  kv_valid_len=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-2, atol=2e-2)


def test_kv_append_uniform_q8_matches_scatter():
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.kvcache.cache import contiguous_write_stacked

    L, B, Hk, S, D = 2, 3, 2, 256, 128
    rng = np.random.default_rng(12)
    kc = jnp.asarray(rng.integers(-100, 100, size=(L, B, Hk, S, D)).astype(np.int8))
    vc = jnp.asarray(rng.integers(-100, 100, size=(L, B, Hk, S, D)).astype(np.int8))
    ks = jnp.asarray(rng.normal(size=(L, B, Hk, S)).astype(np.float32))
    vs = jnp.asarray(rng.normal(size=(L, B, Hk, S)).astype(np.float32))
    knew = jnp.asarray(rng.integers(-100, 100, size=(B, 1, Hk, D)).astype(np.int8))
    vnew = jnp.asarray(rng.integers(-100, 100, size=(B, 1, Hk, D)).astype(np.int8))
    ksn = jnp.asarray(rng.normal(size=(B, 1, Hk)).astype(np.float32))
    vsn = jnp.asarray(rng.normal(size=(B, 1, Hk)).astype(np.float32))
    pos, layer = 137, 1
    posv = jnp.full((B, 1), pos, jnp.int32)

    ref_k = contiguous_write_stacked(kc, jnp.int32(layer), knew, posv)
    ref_ks = contiguous_write_stacked(ks[..., None], jnp.int32(layer),
                                      ksn[..., None], posv)[..., 0]
    with interpret_pallas(ka):
        gk, gv, gks, gvs = ka.kv_append_uniform_q8(
            kc, vc, ks, vs, knew, vnew, ksn, vsn, jnp.int32(pos), layer)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(gks), np.asarray(ref_ks))


def test_fresh_merge_decode_attention_matches_oracle():
    """Old-cache flash + in-register fresh-token merge == attend over the
    cache with the token written (the deferred-append decode path)."""
    import qwen_inference_engine_tpu.ops.decode_attention as da
    from qwen_inference_engine_tpu.kvcache.cache import contiguous_write_stacked

    L, B, Hk, G, D, S = 2, 3, 2, 7, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(21)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    old_lens = jnp.asarray([0, 100, 255], jnp.int32)  # current positions
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    layer = 1

    with interpret_pallas(da):
        got = da.decode_attention_contiguous_fresh(
            q, kc, vc, kn, vn, layer, old_lens)

    # oracle: write the fresh token at position=old_len, attend to len+1
    kc2 = contiguous_write_stacked(kc, jnp.int32(layer), kn, old_lens[:, None])
    vc2 = contiguous_write_stacked(vc, jnp.int32(layer), vn, old_lens[:, None])
    oracle = gqa_attention_kmajor(q, kc2[layer], vc2[layer],
                                  old_lens[:, None], kv_valid_len=old_lens + 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=3e-3, atol=3e-3)


def test_kv_append_all_uniform_matches_scatter():
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.kvcache.cache import contiguous_write_stacked

    L, B, Hk, S, D = 3, 2, 2, 64, 128
    rng = np.random.default_rng(22)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(L, B, 1, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(L, B, 1, Hk, D)).astype(np.float32))
    pos = 37
    posv = jnp.full((B, 1), pos, jnp.int32)

    ref_k, ref_v = kc, vc
    for l in range(L):
        ref_k = contiguous_write_stacked(ref_k, jnp.int32(l), kn[l], posv)
        ref_v = contiguous_write_stacked(ref_v, jnp.int32(l), vn[l], posv)
    with interpret_pallas(ka):
        gk, gv = ka.kv_append_all_uniform(kc, vc, kn, vn, jnp.int32(pos))
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(ref_v))


@pytest.mark.parametrize("pos", [0, 7, 128, 250])
def test_append_fused_decode_attention(pos):
    """Append-fused kernel: output must equal append-then-attend, and the
    cache must contain the appended rows afterwards (aliased band write)."""
    import qwen_inference_engine_tpu.ops.decode_attention as da

    L, B, Hk, G, D, S = 3, 4, 2, 4, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(11)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)).astype(np.float32))
    layer = 1

    # reference: write first, then attend over pos+1 tokens
    kc_ref = kc.at[layer, :, :, pos].set(kn[:, 0])
    vc_ref = vc.at[layer, :, :, pos].set(vn[:, 0])
    lens = jnp.full((B,), pos + 1, jnp.int32)
    oracle = gqa_attention_kmajor(q, kc_ref[layer], vc_ref[layer],
                                  jnp.full((B, 1), pos, jnp.int32),
                                  kv_valid_len=lens)

    with interpret_pallas(da):
        got, kc2, vc2 = da.decode_attention_appending(
            q, kc, vc, kn, vn, layer, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc_ref),
                               rtol=1e-6, atol=1e-6)


def test_paged_decode_attention_q8_matches_oracle():
    """INT8-KV paged kernel vs dequantize-then-attend oracle."""
    import qwen_inference_engine_tpu.ops.paged_attention as pa
    from qwen_inference_engine_tpu.quant.kv_quant import (
        dequantize_kv,
        quantize_kv,
    )

    B, Hk, G, D, page_size, max_pages = 3, 2, 4, 128, 16, 4
    Hq = G * Hk
    P = B * max_pages + 1
    rng = np.random.default_rng(13)
    kf = jnp.asarray(rng.normal(size=(P, Hk, page_size, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(P, Hk, page_size, D)), jnp.float32)
    # quantize per (page, head, slot) row like the runtime does (token rows)
    qk, sk = quantize_kv(kf.reshape(P * Hk * page_size, 1, 1, D))
    qv, sv = quantize_kv(vf.reshape(P * Hk * page_size, 1, 1, D))
    k8 = qk.reshape(P, Hk, page_size, D)
    v8 = qv.reshape(P, Hk, page_size, D)
    ks = sk.reshape(P, Hk, page_size)
    vs = sv.reshape(P, Hk, page_size)

    tables = jnp.asarray(
        rng.permutation(np.arange(1, P))[: B * max_pages].reshape(B, max_pages),
        jnp.int32)
    lens = jnp.asarray([17, 64, 40], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)

    kd = dequantize_kv(k8.reshape(P, Hk, page_size, D),
                       ks.reshape(P, Hk, page_size), jnp.float32)
    vd = dequantize_kv(v8.reshape(P, Hk, page_size, D),
                       vs.reshape(P, Hk, page_size), jnp.float32)
    k_view = paged_read(kd, tables)
    v_view = paged_read(vd, tables)
    oracle = gqa_attention_kmajor(q, k_view, v_view, (lens - 1)[:, None],
                                  kv_valid_len=lens)

    with interpret_pallas(pa):
        got = pa.paged_decode_attention_stacked_q8(
            q, k8[None], v8[None], ks[None], vs[None], tables, lens,
            page_size, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-2, atol=2e-2)


def test_paged_append_ragged_matches_scatter():
    """Ragged paged append kernel vs the XLA scatter (incl. skipped rows)."""
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.kvcache.cache import paged_write_stacked

    L, P, Hk, PS, D = 2, 14, 2, 16, 128
    B, max_pages = 3, 4
    rng = np.random.default_rng(17)
    kp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, Hk, D)), jnp.float32)
    tables = jnp.asarray(rng.permutation(np.arange(1, P))[: B * max_pages]
                         .reshape(B, max_pages), jnp.int32)
    positions = jnp.asarray([5, 33, -1], jnp.int32)  # row 2 inactive
    layer = 1

    active = positions >= 0
    kp_ref = paged_write_stacked(
        kp, layer, jnp.where(active[:, None, None, None], kn, 0),
        jnp.maximum(positions, 0)[:, None],
        jnp.where(active[:, None], tables, 0), PS)
    # row 2 wrote into scratch page 0; the kernel skips it instead — only
    # compare non-scratch pages
    vp_ref = paged_write_stacked(
        vp, layer, jnp.where(active[:, None, None, None], vn, 0),
        jnp.maximum(positions, 0)[:, None],
        jnp.where(active[:, None], tables, 0), PS)

    with interpret_pallas(ka):
        kp2, vp2 = ka.paged_append_ragged(kp, vp, kn, vn, positions, tables,
                                          layer, page_size=PS)
    np.testing.assert_allclose(np.asarray(kp2[:, 1:]), np.asarray(kp_ref[:, 1:]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp2[:, 1:]), np.asarray(vp_ref[:, 1:]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("T,start", [(16, 32), (32, 0), (8, 120)])
def test_chunk_attention_matches_oracle(T, start):
    """Continuation-chunk flash kernel vs the einsum oracle: causal by
    absolute position over the cache prefix."""
    import qwen_inference_engine_tpu.ops.chunk_attention as ca

    L, B, Hk, G, D, S = 2, 3, 2, 4, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(23)
    kc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    layer = 1

    assert ca.chunk_attention_supported(D, T, Hq, Hk, S)
    with interpret_pallas(ca):
        got = ca.chunk_attention_contiguous(q, kc, vc, layer, start)

    positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (B, T))
    oracle = gqa_attention_kmajor(q, kc[layer], vc[layer], positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("T,start", [(16, 32), (8, 120)])
def test_chunk_attention_q8_matches_dequant_oracle(T, start):
    """INT8-KV continuation-chunk kernel vs attention over the dequantized
    cache (the capacity config's prefill path — used to fall back to the
    XLA score-block attention)."""
    import qwen_inference_engine_tpu.ops.chunk_attention as ca
    from qwen_inference_engine_tpu.quant.kv_quant import (
        dequantize_kv,
        quantize_kv,
    )

    L, B, Hk, G, D, S = 2, 3, 2, 4, 128, 256
    Hq = G * Hk
    rng = np.random.default_rng(31)
    kf = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    layer = 1

    with interpret_pallas(ca):
        got = ca.chunk_attention_contiguous_q8(q, kq, vq, ks, vs, layer,
                                               start)

    positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (B, T))
    k_deq = dequantize_kv(kq[layer], ks[layer], jnp.float32)
    v_deq = dequantize_kv(vq[layer], vs[layer], jnp.float32)
    oracle = gqa_attention_kmajor(q, k_deq, v_deq, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-2, atol=2e-2)


def test_chunked_prefill_with_chunk_kernel_matches_xla():
    """prefill_chunked with the continuation-chunk flash kernel (forced
    via attn_impl='pallas', interpret mode) must match the XLA path."""
    import qwen_inference_engine_tpu.ops.chunk_attention as ca
    import qwen_inference_engine_tpu.ops.flash_attention as fa
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import init_params, prefill_chunked

    cfg = tiny_config(num_heads=4, num_kv_heads=2, head_dim=128,
                      hidden_size=256)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    B, T = 2, 96
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.asarray([T, T - 10], jnp.int32)

    cache1 = KVCache.create(cfg.num_layers, B, 128, cfg.num_kv_heads,
                            cfg.head_dim, dtype=jnp.float32)
    ref, _ = prefill_chunked(params, cfg, toks, lens, cache1, chunk=32,
                             attn_impl="xla")

    cache2 = KVCache.create(cfg.num_layers, B, 128, cfg.num_kv_heads,
                            cfg.head_dim, dtype=jnp.float32)
    with interpret_pallas(ca), interpret_pallas(fa):
        got, _ = prefill_chunked(params, cfg, toks, lens, cache2, chunk=32,
                                 attn_impl="pallas")
    # kernels use bf16 MXU dots (pv / scores) vs the f32 einsum path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("G,page_size,T", [(7, 16, 5), (4, 8, 4), (8, 16, 2)])
def test_paged_verify_attention_matches_oracle(G, page_size, T):
    """Multi-query (speculative verify) paged attention vs the einsum
    oracle: each row scores T consecutive fresh tokens at its own ragged
    start, causal by absolute position."""
    import qwen_inference_engine_tpu.ops.paged_attention as pa
    from qwen_inference_engine_tpu.kvcache.cache import paged_write

    B, Hk, D = 3, 2, 128
    Hq = G * Hk
    max_pages = 4
    P = B * max_pages + 1
    rng = np.random.default_rng(31)
    # post-append lens (include the T fresh tokens); ragged across rows,
    # one crossing a page boundary inside the fresh window
    lens = jnp.asarray([T + 2, page_size * 2 + 1, page_size * 3], jnp.int32)

    pages_k = jnp.zeros((P, Hk, page_size, D), jnp.float32)
    pages_v = jnp.zeros((P, Hk, page_size, D), jnp.float32)
    tables = jnp.asarray(
        [[1 + b * max_pages + i for i in range(max_pages)] for b in range(B)],
        jnp.int32)
    S = max_pages * page_size
    kfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    vfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    pages_k = paged_write(pages_k, kfull, pos, tables, page_size)
    pages_v = paged_write(pages_v, vfull, pos, tables, page_size)

    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)).astype(np.float32))
    # oracle: token t of row b sits at absolute position lens[b]-T+t
    k_view = paged_read(pages_k, tables)
    v_view = paged_read(pages_v, tables)
    positions = (lens - T)[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    oracle = gqa_attention_kmajor(q, k_view, v_view, positions)

    assert pa.paged_verify_attention_supported(D, page_size, T, Hq, Hk)
    with interpret_pallas(pa):
        got = pa.paged_verify_attention_stacked(
            q, pages_k[None], pages_v[None], tables, lens, page_size, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)


def test_paged_verify_attention_q8_matches_oracle():
    """INT8-KV verify kernel vs the oracle over the dequantized view."""
    import qwen_inference_engine_tpu.ops.paged_attention as pa
    from qwen_inference_engine_tpu.kvcache.cache import paged_write
    from qwen_inference_engine_tpu.quant.kv_quant import quantize_kv

    B, Hk, G, D, page_size, T = 2, 2, 4, 128, 16, 4
    Hq = G * Hk
    max_pages = 3
    P = B * max_pages + 1
    rng = np.random.default_rng(37)
    lens = jnp.asarray([T + 3, page_size * 2 + 2], jnp.int32)

    tables = jnp.asarray(
        [[1 + b * max_pages + i for i in range(max_pages)] for b in range(B)],
        jnp.int32)
    S = max_pages * page_size
    kfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    vfull = jnp.asarray(rng.normal(size=(B, S, Hk, D)).astype(np.float32))
    qk, sk = quantize_kv(kfull)
    qv, sv = quantize_kv(vfull)
    pages_k = jnp.zeros((P, Hk, page_size, D), jnp.int8)
    pages_v = jnp.zeros((P, Hk, page_size, D), jnp.int8)
    ks = jnp.zeros((P, Hk, page_size), jnp.float32)
    vs = jnp.zeros((P, Hk, page_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    pages_k = paged_write(pages_k, qk, pos, tables, page_size)
    pages_v = paged_write(pages_v, qv, pos, tables, page_size)
    ks = paged_write(ks[..., None], sk[..., None], pos, tables, page_size)[..., 0]
    vs = paged_write(vs[..., None], sv[..., None], pos, tables, page_size)[..., 0]

    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)).astype(np.float32))
    # oracle over the dequantized gathered view
    k_deq = kfull * 0
    k_deq = (qk.astype(np.float32) * np.asarray(sk)[..., None])
    v_deq = (qv.astype(np.float32) * np.asarray(sv)[..., None])
    k_view = jnp.asarray(k_deq).transpose(0, 2, 1, 3)
    v_view = jnp.asarray(v_deq).transpose(0, 2, 1, 3)
    positions = (lens - T)[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    oracle = gqa_attention_kmajor(
        q.astype(jnp.bfloat16).astype(jnp.float32), k_view, v_view, positions)

    with interpret_pallas(pa):
        got = pa.paged_verify_attention_stacked_q8(
            q, pages_k[None], pages_v[None], ks[None], vs[None], tables,
            lens, page_size, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("T,PS", [(5, 16), (4, 8), (8, 8)])
def test_paged_append_ragged_t_matches_scatter(T, PS):
    """Multi-token ragged paged append vs the XLA scatter, including rows
    whose window straddles a page boundary and skipped rows."""
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.kvcache.cache import paged_write_stacked

    L, P, Hk, D = 2, 14, 2, 128
    B, max_pages = 3, 4
    rng = np.random.default_rng(41)
    kp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, T, Hk, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, T, Hk, D)), jnp.float32)
    tables = jnp.asarray(rng.permutation(np.arange(1, P))[: B * max_pages]
                         .reshape(B, max_pages), jnp.int32)
    # row 0 mid-page, row 1 straddles a page boundary, row 2 inactive
    positions = jnp.asarray([2, PS - T // 2 - 1, -1], jnp.int32)
    layer = 1

    active = positions >= 0
    pos2d = (jnp.maximum(positions, 0)[:, None]
             + jnp.arange(T, dtype=jnp.int32)[None])
    kp_ref = paged_write_stacked(
        kp, layer, jnp.where(active[:, None, None, None], kn, 0),
        pos2d, jnp.where(active[:, None], tables, 0), PS)
    vp_ref = paged_write_stacked(
        vp, layer, jnp.where(active[:, None, None, None], vn, 0),
        pos2d, jnp.where(active[:, None], tables, 0), PS)

    with interpret_pallas(ka):
        kp2, vp2 = ka.paged_append_ragged_t(kp, vp, kn, vn, positions,
                                            tables, layer, page_size=PS)
    # the inactive row wrote into scratch page 0 in the oracle; the kernel
    # skips it — compare non-scratch pages only
    np.testing.assert_allclose(np.asarray(kp2[:, 1:]), np.asarray(kp_ref[:, 1:]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp2[:, 1:]), np.asarray(vp_ref[:, 1:]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kv_dtype", ["f32", "int8"])
def test_verify_forward_with_kernels_matches_xla(kv_dtype):
    """The speculative verify forward (paged cache, ragged per-row starts,
    T consecutive fresh tokens) with the verify attention + ragged-T
    append kernels (forced via attn_impl='pallas', interpret mode) must
    match the XLA scatter/gather path."""
    import qwen_inference_engine_tpu.ops.paged_attention as pa
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import PagedKVCache
    from qwen_inference_engine_tpu.models.qwen import (
        forward_hidden,
        init_params,
        prefill,
    )

    cfg = tiny_config(num_heads=4, num_kv_heads=2, head_dim=128,
                      hidden_size=256)
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    B, T, PS = 2, 4, 8
    num_pages, max_pages = 17, 8
    dtype = jnp.float32 if kv_dtype == "f32" else jnp.int8
    rng = np.random.default_rng(11)
    tables = jnp.asarray(
        [[1 + b * max_pages + i for i in range(max_pages)] for b in range(B)],
        jnp.int32)
    # ragged history; row 1's fresh window straddles a page boundary
    hist = np.asarray([10, PS * 2 - 2], np.int32)
    ptoks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (B, int(hist.max()))), jnp.int32)

    def build_cache():
        cache = PagedKVCache.create(cfg.num_layers, num_pages, PS,
                                    cfg.num_kv_heads, cfg.head_dim,
                                    dtype=dtype)
        _, cache = prefill(params, cfg, ptoks, jnp.asarray(hist), cache,
                           block_tables=tables, attn_impl="xla")
        return cache

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    positions = jnp.asarray(hist)[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

    ref, _ = forward_hidden(params, cfg, toks, positions, build_cache(),
                            block_tables=tables, ragged_multi=True,
                            attn_impl="xla")
    with interpret_pallas(pa), interpret_pallas(ka):
        got, _ = forward_hidden(params, cfg, toks, positions, build_cache(),
                                block_tables=tables, ragged_multi=True,
                                attn_impl="pallas")
    tol = 1e-2 if kv_dtype == "f32" else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_contiguous_kernels_row_window():
    """Dynamic row0 (pipeline decode's per-tick microbatch window): the
    contiguous decode attention + uniform append kernels operating on rows
    [row0, row0+Bn) of a bigger cache must match the same ops on a sliced
    copy — bf16 and INT8-KV variants."""
    import qwen_inference_engine_tpu.ops.decode_attention as da
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.quant.kv_quant import quantize_kv

    L, Bc, Bn, Hk, G, D, S = 2, 8, 2, 2, 4, 128, 256
    Hq = G * Hk
    row0 = jnp.int32(4)                     # traced offset, rows 4..5
    rng = np.random.default_rng(17)
    kc = jnp.asarray(rng.normal(size=(L, Bc, Hk, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, Bc, Hk, S, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(Bn, 1, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(Bn, 1, Hk, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(Bn, 1, Hq, D)).astype(np.float32))
    pos, layer = 37, 1

    with interpret_pallas(ka):
        kc2, vc2 = ka.kv_append_uniform(kc, vc, kn, vn, jnp.int32(pos),
                                        layer, row0=row0)
        # window slice must equal appending into the sliced cache
        ks_ref, vs_ref = ka.kv_append_uniform(
            kc[:, 4:6], vc[:, 4:6], kn, vn, jnp.int32(pos), layer)
    np.testing.assert_array_equal(np.asarray(kc2[:, 4:6]), np.asarray(ks_ref))
    np.testing.assert_array_equal(np.asarray(vc2[:, 4:6]), np.asarray(vs_ref))
    # rows outside the window untouched
    np.testing.assert_array_equal(np.asarray(kc2[:, :4]), np.asarray(kc[:, :4]))
    np.testing.assert_array_equal(np.asarray(kc2[:, 6:]), np.asarray(kc[:, 6:]))

    lens = jnp.full((Bn,), pos + 1, jnp.int32)
    with interpret_pallas(da):
        a_win = da.decode_attention_contiguous(q, kc2, vc2, layer, lens,
                                               row0=row0)
        a_ref = da.decode_attention_contiguous(q, kc2[:, 4:6], vc2[:, 4:6],
                                               layer, lens)
    np.testing.assert_allclose(np.asarray(a_win), np.asarray(a_ref),
                               rtol=2e-3, atol=2e-3)

    # ---- INT8-KV variants ----
    kq, ks = quantize_kv(kc)
    vq, vs = quantize_kv(vc)
    qk_n, sk_n = quantize_kv(kn)
    qv_n, sv_n = quantize_kv(vn)
    with interpret_pallas(ka):
        kq2, vq2, ks2, vs2 = ka.kv_append_uniform_q8(
            kq, vq, ks, vs, qk_n, qv_n, sk_n, sv_n, jnp.int32(pos), layer,
            row0=row0)
        kq_r, vq_r, ks_r, vs_r = ka.kv_append_uniform_q8(
            kq[:, 4:6], vq[:, 4:6], ks[:, 4:6], vs[:, 4:6],
            qk_n, qv_n, sk_n, sv_n, jnp.int32(pos), layer)
    np.testing.assert_array_equal(np.asarray(kq2[:, 4:6]), np.asarray(kq_r))
    np.testing.assert_array_equal(np.asarray(ks2[:, 4:6]), np.asarray(ks_r))
    np.testing.assert_array_equal(np.asarray(kq2[:, :4]), np.asarray(kq[:, :4]))
    with interpret_pallas(da):
        a8_win = da.decode_attention_contiguous_q8(
            q, kq2, vq2, ks2, vs2, layer, lens, row0=row0)
        a8_ref = da.decode_attention_contiguous_q8(
            q, kq2[:, 4:6], vq2[:, 4:6], ks2[:, 4:6], vs2[:, 4:6],
            layer, lens)
    np.testing.assert_allclose(np.asarray(a8_win), np.asarray(a8_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("start,T", [(0, 8), (3, 8), (5, 20), (8, 16),
                                     (13, 29)])
def test_paged_append_prefill_matches_scatter_oracle(start, T):
    """Single-row prefill window append (one tile RMW per touched page)
    vs the XLA scatter oracle — page-aligned, mid-page, and multi-page
    straddling starts."""
    import qwen_inference_engine_tpu.ops.kv_append as kva
    from qwen_inference_engine_tpu.models.qwen import paged_write_stacked

    L, P, Hk, PS, D = 2, 12, 2, 8, 128
    rng = np.random.default_rng(start * 100 + T)
    kp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(L, P, Hk, PS, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(1, T, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(1, T, Hk, D)).astype(np.float32))
    tables = jnp.asarray(
        rng.permutation(P - 1)[: (start + T + PS - 1) // PS + 1][None] + 1,
        jnp.int32)
    positions = (start + jnp.arange(T, dtype=jnp.int32))[None]
    layer = 1

    want_k = paged_write_stacked(kp, layer, kn, positions, tables, PS)
    want_v = paged_write_stacked(vp, layer, vn, positions, tables, PS)
    with interpret_pallas(kva):
        got_k, got_v = kva.paged_append_prefill(
            kp, vp, kn, vn, start, tables, layer, page_size=PS)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))


@pytest.mark.parametrize("T,start,page", [(16, 32, 64), (8, 0, 128),
                                          (256, 96, 128)])
def test_paged_chunk_attention_matches_oracle(T, start, page):
    """Paged continuation-piece flash kernel (q rows tiled, pages via
    block table) vs the einsum oracle over the gathered pages. T=256
    exercises the q-tile grid dim (TQ=128)."""
    import qwen_inference_engine_tpu.ops.chunk_attention as ca

    L, B, Hk, G, D = 2, 3, 2, 4, 128
    Hq = G * Hk
    S = start + T
    pps = -(-S // page)
    P = B * pps + 3
    rng = np.random.default_rng(37)
    kp = jnp.asarray(rng.normal(size=(L, P, Hk, page, D)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(L, P, Hk, page, D)), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps), jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    layer = 1

    assert ca.paged_chunk_attention_supported(D, T, Hq, Hk, page)
    with interpret_pallas(ca):
        got = ca.paged_chunk_attention(q, kp, vp, tables, layer, start,
                                       page)

    positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (B, T))
    k_all = paged_read(kp[layer], tables)
    v_all = paged_read(vp[layer], tables)
    oracle = gqa_attention_kmajor(q, k_all, v_all, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("T,start", [(16, 32), (8, 120)])
def test_paged_chunk_attention_q8_matches_dequant_oracle(T, start):
    import qwen_inference_engine_tpu.ops.chunk_attention as ca
    from qwen_inference_engine_tpu.quant.kv_quant import (
        dequantize_kv,
        quantize_kv,
    )

    L, B, Hk, G, D, page = 2, 2, 2, 4, 128, 64
    Hq = G * Hk
    S = start + T
    pps = -(-S // page)
    P = B * pps + 2
    rng = np.random.default_rng(41)
    kf = jnp.asarray(rng.normal(size=(L, P, Hk, page, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(L, P, Hk, page, D)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps), jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)), jnp.float32)
    layer = 0

    with interpret_pallas(ca):
        got = ca.paged_chunk_attention_q8(q, kq, vq, ks, vs, tables,
                                          layer, start, page)

    positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (B, T))
    k_deq = dequantize_kv(paged_read(kq[layer], tables),
                          paged_read(ks[layer][..., None],
                                     tables)[..., 0], jnp.float32)
    v_deq = dequantize_kv(paged_read(vq[layer], tables),
                          paged_read(vs[layer][..., None],
                                     tables)[..., 0], jnp.float32)
    oracle = gqa_attention_kmajor(q, k_deq, v_deq, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kv_dtype", ["f32", "int8"])
def test_prefill_piece_with_paged_chunk_kernel_matches_xla(kv_dtype):
    """A chunked-prefill CONTINUATION piece into the page pool (the
    serving scheduler's admission path: B=1, consecutive positions) with
    the paged chunk-attention + prefill-append kernels (forced via
    attn_impl='pallas', interpret mode) must match the XLA
    scatter/gather path."""
    import qwen_inference_engine_tpu.ops.chunk_attention as ca
    import qwen_inference_engine_tpu.ops.kv_append as ka
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import PagedKVCache
    from qwen_inference_engine_tpu.models.qwen import (
        forward_hidden,
        init_params,
        prefill,
    )

    cfg = tiny_config(num_heads=4, num_kv_heads=2, head_dim=128,
                      hidden_size=256)
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    T, PS = 16, 8
    num_pages, max_pages = 9, 8
    hist = 13  # piece starts mid-page
    dtype = jnp.float32 if kv_dtype == "f32" else jnp.int8
    rng = np.random.default_rng(13)
    tables = jnp.asarray([[1 + i for i in range(max_pages)]], jnp.int32)
    ptoks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, hist)),
                        jnp.int32)

    def build_cache():
        cache = PagedKVCache.create(cfg.num_layers, num_pages, PS,
                                    cfg.num_kv_heads, cfg.head_dim,
                                    dtype=dtype)
        _, cache = prefill(params, cfg, ptoks,
                           jnp.asarray([hist], jnp.int32), cache,
                           block_tables=tables, attn_impl="xla")
        return cache

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
    positions = hist + jnp.arange(T, dtype=jnp.int32)[None, :]

    ref, _ = forward_hidden(params, cfg, toks, positions, build_cache(),
                            block_tables=tables, attn_impl="xla")
    with interpret_pallas(ca), interpret_pallas(ka):
        got, cache2 = forward_hidden(params, cfg, toks, positions,
                                     build_cache(), block_tables=tables,
                                     attn_impl="pallas")
    tol = 1e-2 if kv_dtype == "f32" else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=tol, atol=tol)
