"""Fused attention+matmul kernel vs the separate oracles (interpret mode).

The fused kernel must reproduce ops.decode_attention (online-softmax flash
over the stacked cache) and the INT4 quant matmul bit-for-nearly-bit while
interleaving both on one grid."""

import contextlib
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.ops.linear import QuantLinear, dequantize


@contextlib.contextmanager
def interpret_pallas(module):
    orig = module.pl.pallas_call

    def call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(module.pl, "pallas_call", call):
        yield


def _attn_oracle(q8, k_cache, v_cache, layer, lens, scale, row0):
    """Masked softmax attention over rows [row0, row0+Ba) of the cache."""
    Ba, Hk, G8, D = q8.shape
    k = k_cache[layer, row0:row0 + Ba].astype(jnp.float32)  # [Ba,Hk,S,D]
    v = v_cache[layer, row0:row0 + Ba].astype(jnp.float32)
    q = q8.astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", q, k) * scale
    S = k.shape[2]
    valid = jnp.arange(S)[None, None, None, :] < lens[:, None, None, None]
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhgs,bhsd->bhgd", p, v)


@pytest.mark.parametrize("S,block_s,block_n", [(256, 128, 128), (512, 256, 256)])
def test_fused_attn_matmul_matches_oracles(S, block_s, block_n):
    import qwen_inference_engine_tpu.ops.fused_step as fs

    rng = np.random.default_rng(0)
    L, B, Hk, G8, D = 2, 8, 2, 8, 128
    Ba, row0 = 4, 4
    Mb, K, N, gs = 8, 256, 512, 64
    layer = 1

    q8 = jnp.asarray(rng.normal(size=(Ba, Hk, G8, D)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, S, size=(Ba,)), jnp.int32)

    x = jnp.asarray(rng.normal(size=(Mb, K)), jnp.float32)
    wq = jnp.asarray(rng.integers(-128, 128, size=(L, K // 2, N)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.01, 0.02, size=(L, K // gs, N)),
                         jnp.float32)

    scale = D ** -0.5
    with interpret_pallas(fs):
        attn, y = fs.fused_attn_matmul(
            lens, jnp.asarray([layer], jnp.int32), q8, k_cache, v_cache,
            x, wq, scales, scale=scale, group_size=gs, block_n=block_n,
            block_s=block_s, row0=row0)

    attn_ref = _attn_oracle(q8, k_cache, v_cache, layer, lens, scale, row0)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                               rtol=2e-3, atol=2e-3)

    lin = QuantLinear(q=wq[layer], scales=scales[layer], b=None, bits=4,
                      group_size=gs)
    y_ref = x @ dequantize(lin).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_attn_mlp_matches_oracles():
    import qwen_inference_engine_tpu.ops.fused_step as fs

    rng = np.random.default_rng(1)
    L, B, Hk, G8, D, S = 2, 8, 2, 8, 128, 256
    Ba, row0 = 4, 0
    Mb, K, F = 8, 256, 512
    gs_gate, gs_down = 64, 128
    layer_a, layer_m = 1, 0

    q8 = jnp.asarray(rng.normal(size=(Ba, Hk, G8, D)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, B, Hk, S, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, S, size=(Ba,)), jnp.int32)

    x = jnp.asarray(rng.normal(size=(Mb, K)), jnp.float32)
    wg = jnp.asarray(rng.integers(-128, 128, (L, K // 2, F)), jnp.int8)
    wu = jnp.asarray(rng.integers(-128, 128, (L, K // 2, F)), jnp.int8)
    wd = jnp.asarray(rng.integers(-128, 128, (L, F // 2, K)), jnp.int8)
    sg = jnp.asarray(rng.uniform(0.01, 0.02, (L, K // gs_gate, F)), jnp.float32)
    su = jnp.asarray(rng.uniform(0.01, 0.02, (L, K // gs_gate, F)), jnp.float32)
    sd = jnp.asarray(rng.uniform(0.01, 0.02, (L, F // gs_down, K)), jnp.float32)

    scale = D ** -0.5
    with interpret_pallas(fs):
        attn, y = fs.fused_attn_mlp(
            lens, jnp.asarray([layer_a], jnp.int32),
            jnp.asarray([layer_m], jnp.int32), q8, k_cache, v_cache, x,
            wg, sg, wu, su, wd, sd, scale=scale, gs_gate=gs_gate,
            gs_down=gs_down, block_n=256, block_s=128, row0=row0)

    attn_ref = _attn_oracle(q8, k_cache, v_cache, layer_a, lens, scale, row0)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref),
                               rtol=2e-3, atol=2e-3)

    def deq(w, s, gs):
        lin = QuantLinear(q=w[layer_m], scales=s[layer_m], b=None, bits=4,
                          group_size=gs)
        return dequantize(lin).astype(jnp.float32)

    g = x @ deq(wg, sg, gs_gate)
    u = x @ deq(wu, su, gs_gate)
    h = jax.nn.silu(g) * u
    y_ref = h @ deq(wd, sd, gs_down)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-2, atol=3e-2)


def test_decode_step_pumped_matches_decode_step():
    """Double-pumped decode (fused attn∥mlp kernels, per-half appends) must
    reproduce the plain decode_step logits over several steps."""
    from unittest import mock

    import qwen_inference_engine_tpu.ops.fused_step as fs
    import qwen_inference_engine_tpu.ops.kv_append as ka
    import qwen_inference_engine_tpu.ops.quant_matmul as qm
    import qwen_inference_engine_tpu.ops.linear as lin_mod
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import (
        decode_step,
        decode_step_pumped,
        init_quantized_params,
        prefill,
        pumped_supported,
    )

    cfg = tiny_config(vocab_size=512, hidden_size=256, intermediate_size=512,
                      num_layers=3, num_heads=2, num_kv_heads=1, head_dim=128)
    params = init_quantized_params(cfg, jax.random.PRNGKey(7), bits=4,
                                   group_size=64, dtype=jnp.float32,
                                   pad_free=True)
    B, T, S = 4, 8, 256
    cache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    # model/cache shapes qualify (the real batch gate is B > 128 — the
    # tiny parity batch calls decode_step_pumped directly)
    assert pumped_supported(cfg, params, cache, 192)

    rng = np.random.default_rng(2)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    logits, cache = prefill(params, cfg, prompts, lens, cache)
    cache2 = KVCache(k=cache.k, v=cache.v)  # copy for the pumped run
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    tok2 = tok

    patches = [mock.patch.object(m.pl, "pallas_call",
                                 _interp_call(m.pl.pallas_call))
               for m in (fs, ka, qm)]
    patches.append(mock.patch.object(lin_mod, "_pallas_available",
                                     lambda: True))
    import contextlib
    with contextlib.ExitStack() as st:
        for p in patches:
            st.enter_context(p)
        for s in range(3):
            pos = lens + s
            ref, cache = decode_step(params, cfg, tok, pos, cache,
                                     uniform_decode=True)
            got, cache2 = decode_step_pumped(params, cfg, tok2, pos, cache2,
                                             block_n=256, block_s=128)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=4e-3, atol=4e-3,
                                       err_msg=f"step {s}")
            tok = jnp.argmax(ref, -1).astype(jnp.int32)
            tok2 = jnp.argmax(got, -1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok2))


def _interp_call(orig):
    def call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)
    return call


def test_fused_mlp_matches_oracle():
    import qwen_inference_engine_tpu.ops.fused_step as fs

    rng = np.random.default_rng(4)
    L, Mb, K, F = 2, 8, 256, 512
    gs_gate, gs_down = 64, 128
    layer = 1
    x = jnp.asarray(rng.normal(size=(Mb, K)), jnp.float32)
    wg = jnp.asarray(rng.integers(-128, 128, (L, K // 2, F)), jnp.int8)
    wu = jnp.asarray(rng.integers(-128, 128, (L, K // 2, F)), jnp.int8)
    wd = jnp.asarray(rng.integers(-128, 128, (L, F // 2, K)), jnp.int8)
    sg = jnp.asarray(rng.uniform(0.01, 0.02, (L, K // gs_gate, F)), jnp.float32)
    su = jnp.asarray(rng.uniform(0.01, 0.02, (L, K // gs_gate, F)), jnp.float32)
    sd = jnp.asarray(rng.uniform(0.01, 0.02, (L, F // gs_down, K)), jnp.float32)

    with interpret_pallas(fs):
        y = fs.fused_mlp(x, wg, sg, wu, su, wd, sd, layer,
                         gs_gate=gs_gate, gs_down=gs_down, block_n=256)

    def deq(w, s, gs):
        lin = QuantLinear(q=w[layer], scales=s[layer], b=None, bits=4,
                          group_size=gs)
        return dequantize(lin).astype(jnp.float32)

    g = x @ deq(wg, sg, gs_gate)
    u = x @ deq(wu, su, gs_gate)
    y_ref = (jax.nn.silu(g) * u) @ deq(wd, sd, gs_down)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-2, atol=3e-2)
