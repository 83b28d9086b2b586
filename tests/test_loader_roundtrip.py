"""End-to-end checkpoint loading: HF save_pretrained (SHARDED
safetensors, index.json) → our loader → logit parity with the HF model.

The full pipeline the reference needed tensor_parser.cpp + weights.bin
for: header parse, shard index resolution, memmap reads, name mapping,
transposes, bias handling — one real round trip instead of unit shims."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.loader.safetensors_loader import (
    load_checkpoint,
)
from qwen_inference_engine_tpu.models.qwen import score_logits

B, T = 2, 10


@pytest.mark.parametrize("qk_norm", [False, True], ids=["qwen2", "qwen3"])
def test_sharded_safetensors_roundtrip(tmp_path, qk_norm):
    import transformers

    cfg = tiny_config(qk_norm=qk_norm)
    hf_cfg_dict = cfg.to_hf_config()
    if qk_norm:
        hf_cfg = transformers.Qwen3Config(**hf_cfg_dict, attention_bias=False)
        model = transformers.Qwen3ForCausalLM(hf_cfg)
    else:
        hf_cfg = transformers.Qwen2Config(**hf_cfg_dict)
        model = transformers.Qwen2ForCausalLM(hf_cfg)
    torch.manual_seed(0)
    model = model.eval()
    # tiny shard size forces MULTIPLE shards + model.safetensors.index.json
    model.save_pretrained(tmp_path, max_shard_size="300KB",
                          safe_serialization=True)
    idx = list(tmp_path.glob("*.safetensors"))
    assert len(idx) > 1, "test needs the sharded-index path"

    loaded_cfg, params = load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert loaded_cfg.num_layers == cfg.num_layers
    assert loaded_cfg.qk_norm == cfg.qk_norm

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens).long()).logits.float().numpy()
    cache = KVCache.create(loaded_cfg.num_layers, B, 32,
                           loaded_cfg.num_kv_heads, loaded_cfg.head_dim,
                           dtype=jnp.float32)
    ours = np.asarray(
        score_logits(params, loaded_cfg, jnp.asarray(tokens), cache),
        np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_sharded_safetensors_roundtrip_moe(tmp_path):
    import transformers

    cfg = tiny_config(qk_norm=True).replace(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64)
    hf_cfg = transformers.Qwen3MoeConfig(**cfg.to_hf_config(),
                                         attention_bias=False)
    torch.manual_seed(1)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, max_shard_size="300KB",
                          safe_serialization=True)

    loaded_cfg, params = load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert loaded_cfg.is_moe and loaded_cfg.num_experts == 4

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens).long()).logits.float().numpy()
    cache = KVCache.create(loaded_cfg.num_layers, B, 32,
                           loaded_cfg.num_kv_heads, loaded_cfg.head_dim,
                           dtype=jnp.float32)
    ours = np.asarray(
        score_logits(params, loaded_cfg, jnp.asarray(tokens), cache),
        np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
