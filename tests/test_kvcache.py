"""KV cache tests: paged vs contiguous parity, INT8 KV roundtrip,
write/read semantics (replacing the reference's manual cache dumps,
include_cuda.cu:11-49, with assertions)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.kvcache.cache import (
    KVCache,
    PagedKVCache,
    contiguous_write,
    paged_read,
    paged_write,
    pages_required,
)
from qwen_inference_engine_tpu.models.qwen import decode_step, init_params, prefill
from qwen_inference_engine_tpu.quant.kv_quant import dequantize_kv, quantize_kv


def test_contiguous_write_scatter_equals_slice():
    B, S, H, D, T = 2, 16, 2, 8, 5
    rng = np.random.default_rng(0)
    cache = jnp.zeros((B, H, S, D), jnp.float32)  # head-major
    new = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    a = contiguous_write(cache, new, pos, fresh_prefill=True)
    b = contiguous_write(cache, new, pos, fresh_prefill=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_paged_write_read_roundtrip():
    P, PS, H, D = 8, 4, 2, 8
    B, T = 2, 6
    rng = np.random.default_rng(1)
    pages = jnp.zeros((P, H, PS, D), jnp.float32)
    block_tables = jnp.asarray([[3, 1, 0, 0], [5, 2, 7, 0]], jnp.int32)
    new = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    pages = paged_write(pages, new, pos, block_tables, PS)
    view = paged_read(pages, block_tables)  # head-major [B, H, 16, D]
    np.testing.assert_allclose(np.asarray(view[:, :, :T]),
                               np.asarray(new.swapaxes(1, 2)), rtol=1e-6)


def test_pages_required():
    assert pages_required(1, 4) == 1
    assert pages_required(4, 4) == 1
    assert pages_required(5, 4) == 2


def test_paged_decode_matches_contiguous():
    """Same model, same tokens: paged and contiguous caches give the same
    logits at every decode step."""
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, prompt_len, steps = 2, 5, 4
    page_size = 4
    max_pages = 4
    rng = np.random.default_rng(2)
    toks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(B, prompt_len + steps)).astype(np.int32)
    )
    lens = jnp.full((B,), prompt_len, jnp.int32)

    ccache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                            dtype=jnp.float32)
    pcache = PagedKVCache.create(cfg.num_layers, max_pages * B + 1, page_size,
                                 cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    # distinct non-overlapping pages per sequence (page 0 kept as scratch)
    block_tables = jnp.asarray(
        [[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32
    )

    lc, ccache = prefill(params, cfg, toks[:, :prompt_len], lens, ccache)
    lp, pcache = prefill(params, cfg, toks[:, :prompt_len], lens, pcache,
                         block_tables=block_tables)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lp), rtol=1e-4, atol=1e-4)

    for t in range(prompt_len, prompt_len + steps):
        pos = jnp.full((B,), t, jnp.int32)
        lc, ccache = decode_step(params, cfg, toks[:, t], pos, ccache)
        lp, pcache = decode_step(params, cfg, toks[:, t], pos, pcache,
                                 block_tables=block_tables)
        np.testing.assert_allclose(
            np.asarray(lc), np.asarray(lp), rtol=1e-4, atol=1e-4, err_msg=f"step {t}"
        )


def test_kv_int8_roundtrip_error():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 7, 2, 64)).astype(np.float32))
    q, s = quantize_kv(x)
    back = dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.02, err


def test_int8_kv_cache_end_to_end():
    """Decode with an INT8 KV cache stays close to the bf16-cache logits."""
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, prompt_len = 2, 6
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt_len)).astype(np.int32))
    lens = jnp.full((B,), prompt_len, jnp.int32)

    ref_cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                               dtype=jnp.float32)
    q_cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                             dtype=jnp.int8)
    lr, ref_cache = prefill(params, cfg, toks, lens, ref_cache)
    lq, q_cache = prefill(params, cfg, toks, lens, q_cache)
    # prefill last-token logits go through the quantized cache read path only
    # at the next decode step; compare a decode step after prefill
    pos = jnp.full((B,), prompt_len, jnp.int32)
    nxt = jnp.asarray([1, 2], jnp.int32)
    dr, _ = decode_step(params, cfg, nxt, pos, ref_cache)
    dq, _ = decode_step(params, cfg, nxt, pos, q_cache)
    # int8 KV error is small but nonzero; logits should stay within ~1%
    ref = np.asarray(dr)
    diff = np.abs(np.asarray(dq) - ref).max()
    scale = np.abs(ref).max()
    assert diff / scale < 0.05, (diff, scale)


def test_chunked_prefill_paged_matches_monolithic():
    """prefill_chunked over the paged cache == monolithic paged prefill."""
    from qwen_inference_engine_tpu.models.qwen import (
        init_params,
        prefill,
        prefill_chunked,
    )

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    B, T, page_size, max_pages = 2, 24, 8, 5
    rng = np.random.default_rng(13)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32))
    lens = jnp.asarray([T, T - 3], jnp.int32)
    tables = jnp.asarray([[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]], jnp.int32)

    p1 = PagedKVCache.create(cfg.num_layers, max_pages * B + 1, page_size,
                             cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    p2 = PagedKVCache.create(cfg.num_layers, max_pages * B + 1, page_size,
                             cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    l1, p1 = prefill(params, cfg, toks, lens, p1, block_tables=tables)
    l2, p2 = prefill_chunked(params, cfg, toks, lens, p2, block_tables=tables,
                             chunk=8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)

    from qwen_inference_engine_tpu.models.qwen import decode_step

    nxt = jnp.asarray([4, 6], jnp.int32)
    d1, _ = decode_step(params, cfg, nxt, lens, p1, block_tables=tables)
    d2, _ = decode_step(params, cfg, nxt, lens, p2, block_tables=tables)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=2e-4)
