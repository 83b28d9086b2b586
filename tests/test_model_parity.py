"""End-to-end logit parity vs HuggingFace Qwen2/Qwen3 (torch CPU oracle).

The golden-value strategy SURVEY.md §4 calls for: tiny random-weight HF
models checked against our forward in fp32 (tolerances are float-roundoff,
not "close enough" — any RoPE/eps/GQA wiring mistake shows up as gross
error). Also checks decode vs prefill self-consistency: N decode steps must
reproduce the full-forward logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.loader.convert import params_from_state_dict
from qwen_inference_engine_tpu.models.qwen import (
    decode_step,
    prefill,
    score_logits,
)

B, T = 2, 12


def _hf_model(cfg):
    import transformers

    hf_cfg_dict = cfg.to_hf_config()
    if cfg.qk_norm:
        hf_cfg = transformers.Qwen3Config(**hf_cfg_dict, attention_bias=False)
        cls = transformers.Qwen3ForCausalLM
    else:
        hf_cfg = transformers.Qwen2Config(**hf_cfg_dict)
        cls = transformers.Qwen2ForCausalLM
    torch.manual_seed(0)
    model = cls(hf_cfg).eval()
    return model


@pytest.mark.parametrize("qk_norm", [False, True], ids=["qwen2", "qwen3"])
def test_logit_parity_vs_hf(qk_norm):
    cfg = tiny_config(qk_norm=qk_norm)
    model = _hf_model(cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)

    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens).long()).logits.float().numpy()

    params = params_from_state_dict(cfg, model.state_dict(), dtype=jnp.float32)
    cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
    ours = np.asarray(
        score_logits(params, cfg, jnp.asarray(tokens), cache), np.float32
    )
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("qk_norm", [False, True], ids=["qwen2", "qwen3"])
def test_decode_matches_full_forward(qk_norm):
    """prefill(prompt) then decode one token at a time == one full forward."""
    cfg = tiny_config(qk_norm=qk_norm)
    key = jax.random.PRNGKey(0)
    from qwen_inference_engine_tpu.models.qwen import init_params

    params = init_params(cfg, key, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    full = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32))
    prompt_len = 5

    cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
    full_cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads, cfg.head_dim,
                                dtype=jnp.float32)
    all_logits = np.asarray(score_logits(params, cfg, full, full_cache), np.float32)

    lens = jnp.full((B,), prompt_len, jnp.int32)
    logits, cache = prefill(params, cfg, full[:, :prompt_len], lens, cache)
    np.testing.assert_allclose(
        np.asarray(logits), all_logits[:, prompt_len - 1], rtol=1e-4, atol=1e-4
    )
    for t in range(prompt_len, T):
        tok = full[:, t]
        pos = jnp.full((B,), t, jnp.int32)
        logits, cache = decode_step(params, cfg, tok, pos, cache)
        np.testing.assert_allclose(
            np.asarray(logits), all_logits[:, t], rtol=1e-4, atol=1e-4,
            err_msg=f"step {t}",
        )


def test_prefill_right_padding_invariance():
    """Padded prompt slots must not affect the last-token logits."""
    cfg = tiny_config()
    from qwen_inference_engine_tpu.models.qwen import init_params

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)).astype(np.int32))
    lens = jnp.asarray([6], jnp.int32)

    def run(padded_to):
        pad = jnp.zeros((1, padded_to - 6), jnp.int32) + 9  # arbitrary pad id
        toks = jnp.concatenate([prompt, pad], axis=1)
        cache = KVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads, cfg.head_dim,
                               dtype=jnp.float32)
        logits, _ = prefill(params, cfg, toks, lens, cache)
        return np.asarray(logits)

    np.testing.assert_allclose(run(8), run(16), rtol=1e-5, atol=1e-5)


def test_chunked_prefill_matches_monolithic():
    """prefill_chunked == prefill logits and equal subsequent decode."""
    from qwen_inference_engine_tpu.models.qwen import (
        decode_step,
        init_params,
        prefill,
        prefill_chunked,
    )

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    B, T = 2, 24
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32))
    lens = jnp.asarray([T, T - 5], jnp.int32)

    c1 = KVCache.create(cfg.num_layers, B, 64, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    c2 = KVCache.create(cfg.num_layers, B, 64, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    l1, c1 = prefill(params, cfg, toks, lens, c1)
    l2, c2 = prefill_chunked(params, cfg, toks, lens, c2, chunk=8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)

    nxt = jnp.asarray([7, 9], jnp.int32)
    d1, _ = decode_step(params, cfg, nxt, lens, c1)
    d2, _ = decode_step(params, cfg, nxt, lens, c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=2e-4)


def test_fused_projections_match_split():
    """fuse_projections (qkv + gateup single-call projections) must not
    change greedy generation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import (
        decode_step,
        init_params,
        prefill,
    )
    from qwen_inference_engine_tpu.quant.quantize import (
        QuantConfig,
        fuse_projections,
        quantize_params,
    )

    cfg = tiny_config()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32),
        QuantConfig(bits=4, group_size=16))
    fused = fuse_projections(params)
    assert "qkv" in fused["layers"] and "gateup" in fused["layers"]

    rng = np.random.default_rng(3)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    lens = jnp.full((2,), 6, jnp.int32)

    def run(p):
        cache = KVCache.create(cfg.num_layers, 2, 64, cfg.num_kv_heads,
                               cfg.head_dim, dtype=jnp.float32)
        logits, cache = prefill(p, cfg, prompts, lens, cache)
        toks = [jnp.argmax(logits, -1)]
        for s in range(4):
            logits, cache = decode_step(p, cfg, toks[-1].astype(jnp.int32),
                                        lens + s, cache, uniform_decode=True)
            toks.append(jnp.argmax(logits, -1))
        return np.asarray(jnp.stack(toks))

    np.testing.assert_array_equal(run(params), run(fused))


def test_logit_parity_vs_hf_qwen3_moe():
    """Tiny Qwen3-MoE (8 experts, top-2) vs the HF torch oracle: router
    softmax/top-k semantics, expert grouped matmuls, and weighted combine
    must all match to float roundoff."""
    import transformers

    cfg = tiny_config(qk_norm=True).replace(
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64)
    hf_cfg = transformers.Qwen3MoeConfig(**cfg.to_hf_config(),
                                         attention_bias=False)
    torch.manual_seed(0)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens).long()).logits.float().numpy()

    params = params_from_state_dict(cfg, model.state_dict(), dtype=jnp.float32)
    cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    ours = np.asarray(
        score_logits(params, cfg, jnp.asarray(tokens), cache), np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_moe_decode_matches_full_forward():
    """MoE prefill + per-token decode == one full forward (routing must be
    position-independent through the cache path)."""
    from qwen_inference_engine_tpu.models.qwen import init_params

    cfg = tiny_config(qk_norm=True).replace(
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    full = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    prompt_len = 5
    cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    full_cache = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                                cfg.head_dim, dtype=jnp.float32)
    all_logits = np.asarray(score_logits(params, cfg, full, full_cache),
                            np.float32)
    lens = jnp.full((B,), prompt_len, jnp.int32)
    logits, cache = prefill(params, cfg, full[:, :prompt_len], lens, cache)
    np.testing.assert_allclose(np.asarray(logits),
                               all_logits[:, prompt_len - 1], rtol=2e-3,
                               atol=2e-3)
    for s in range(prompt_len, T):
        logits, cache = decode_step(params, cfg, full[:, s],
                                    jnp.full((B,), s, jnp.int32), cache)
        np.testing.assert_allclose(np.asarray(logits), all_logits[:, s],
                                   rtol=2e-3, atol=2e-3, err_msg=f"pos {s}")
