"""Quantized-checkpoint save/load roundtrip (loader/qcheckpoint.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.loader.qcheckpoint import (
    load_quantized,
    save_quantized,
)
from qwen_inference_engine_tpu.models.qwen import decode_step, init_params, prefill
from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_params


def test_qcheckpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(0), jnp.float32),
        QuantConfig(bits=4, group_size=16),
    )
    save_quantized(str(tmp_path), cfg, params)
    cfg2, params2 = load_quantized(str(tmp_path))
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.eos_token_ids == cfg.eos_token_ids

    # same logits from both pytrees
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)).astype(np.int32))
    lens = jnp.asarray([6], jnp.int32)
    c1 = KVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    c2 = KVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads, cfg.head_dim,
                        dtype=jnp.float32)
    l1, _ = prefill(params, cfg, toks, lens, c1)
    l2, _ = prefill(params2, cfg2, toks, lens, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
