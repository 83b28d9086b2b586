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

from qwen_inference_engine_tpu.ops.attention import gqa_attention
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
    k_view = paged_read(pages_k, tables)
    v_view = paged_read(pages_v, tables)
    oracle = gqa_attention(q, k_view, v_view, (lens - 1)[:, None])

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

    k_view = paged_read(pages_k, tables)
    v_view = paged_read(pages_v, tables)
    oracle = gqa_attention(q, k_view, v_view, (lens - 1)[:, None])
    with interpret_pallas(pa):
        got = pa.paged_decode_attention(q, pages_k, pages_v, tables, lens,
                                        page_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)
