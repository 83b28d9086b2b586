"""Perplexity harness tests + quantization-accuracy gates (tiny-model
analogue of the BASELINE.md WikiText-2 Δppl targets — same protocol,
synthetic data; both arms see identical tokens so the delta is meaningful)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.config import tiny_config
from qwen_inference_engine_tpu.models.qwen import init_params
from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_params
from qwen_inference_engine_tpu.utils.ppl import perplexity

CFG = tiny_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
RNG = np.random.default_rng(0)
# structured synthetic stream (periodic patterns → model-independent but
# deterministic; enough tokens for 8 windows of 128)
TOKENS = ((np.arange(1024) * 7 + RNG.integers(0, 5, 1024)) % CFG.vocab_size).astype(np.int32)


def test_perplexity_finite_and_reasonable():
    ppl = perplexity(PARAMS, CFG, TOKENS, seq_len=128, batch_size=4)
    assert np.isfinite(ppl)
    # random model ≈ uniform over vocab → ppl near vocab_size
    assert 10 < ppl < CFG.vocab_size * 3


def test_perplexity_batch_invariance():
    p1 = perplexity(PARAMS, CFG, TOKENS, seq_len=128, batch_size=1)
    p4 = perplexity(PARAMS, CFG, TOKENS, seq_len=128, batch_size=4)
    assert abs(p1 - p4) / p1 < 1e-4


@pytest.mark.parametrize("bits,limit", [(8, 0.02), (4, 0.10)])
def test_quantized_ppl_delta(bits, limit):
    """Relative ppl increase from weight-only quantization stays small
    (tiny-model proxy for the WikiText-2 Δ gates)."""
    base = perplexity(PARAMS, CFG, TOKENS, seq_len=128)
    qparams = quantize_params(PARAMS, QuantConfig(bits=bits, group_size=32))
    qppl = perplexity(qparams, CFG, TOKENS, seq_len=128)
    rel = abs(qppl - base) / base
    assert rel < limit, (base, qppl, rel)


def test_quantized_lm_head_ppl_delta():
    """Quantizing the lm_head (the accuracy-sensitive projection) must
    still hold a small delta — gate for the bench's quantize_lm_head=1."""
    base = perplexity(PARAMS, CFG, TOKENS, seq_len=128)
    qparams = quantize_params(
        PARAMS, QuantConfig(bits=4, group_size=32, quantize_lm_head=True))
    qppl = perplexity(qparams, CFG, TOKENS, seq_len=128)
    rel = abs(qppl - base) / base
    assert rel < 0.15, (base, qppl, rel)


@pytest.mark.parametrize("gs", [16, 32, 64])
def test_int4_group_size_sweep(gs):
    """Δppl must degrade monotonically-gently across group sizes (the
    7B-scale sweep of gs 128/256 scaled to tiny dims)."""
    base = perplexity(PARAMS, CFG, TOKENS, seq_len=128)
    qparams = quantize_params(PARAMS, QuantConfig(bits=4, group_size=gs))
    qppl = perplexity(qparams, CFG, TOKENS, seq_len=128)
    rel = abs(qppl - base) / base
    assert rel < 0.12, (gs, base, qppl, rel)


def test_pad_free_quantization_ppl_matches_padded():
    """pad_free packing (shrunken group sizes instead of K padding — the
    layout the fused kernels need) must not change accuracy class."""
    a = quantize_params(PARAMS, QuantConfig(bits=4, group_size=32))
    b = quantize_params(PARAMS, QuantConfig(bits=4, group_size=32,
                                            pad_free=True))
    pa = perplexity(a, CFG, TOKENS, seq_len=128)
    pb = perplexity(b, CFG, TOKENS, seq_len=128)
    assert abs(pa - pb) / pa < 0.02, (pa, pb)


@pytest.mark.parametrize("bits,limit", [(8, 0.04), (4, 0.12)])
def test_act_quant_ppl_delta(bits, limit):
    """W8A8 / W4A8 gate: per-token int8 activation quantization on top of
    weight quant must stay within the weight-only accuracy class (the
    decode-path act_bits=8 mode, ops/quant_matmul.py)."""
    base = perplexity(PARAMS, CFG, TOKENS, seq_len=128)
    qparams = quantize_params(PARAMS, QuantConfig(bits=bits, group_size=32))
    a8 = perplexity(qparams, CFG.replace(act_bits=8), TOKENS, seq_len=128)
    rel = abs(a8 - base) / base
    assert rel < limit, (base, a8, rel)


def test_act_quant_lm_head_ppl_delta():
    """W4A8 logits GEMM gate (cfg.act_bits_lm_head): quantizing the
    lm_head input per token must stay in the quantized-lm-head accuracy
    class."""
    base = perplexity(PARAMS, CFG, TOKENS, seq_len=128)
    qparams = quantize_params(
        PARAMS, QuantConfig(bits=4, group_size=32, quantize_lm_head=True))
    a8 = perplexity(qparams, CFG.replace(act_bits=8, act_bits_lm_head=8),
                    TOKENS, seq_len=128)
    rel = abs(a8 - base) / base
    assert rel < 0.16, (base, a8, rel)


@pytest.mark.parametrize("bits,limit", [(8, 0.03), (4, 0.15)])
def test_quantized_moe_ppl_delta(bits, limit):
    """Δppl gate with the EXPERT stacks quantized too (quantize_params
    covers moe_gate/up/down — for Qwen3-MoE the experts are ~95% of all
    params, so this is the gate that matters; VERDICT r2 item #2)."""
    cfg = tiny_config(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=64)
    params = init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    base = perplexity(params, cfg, TOKENS, seq_len=128)
    qparams = quantize_params(params, QuantConfig(bits=bits, group_size=32,
                                                  pad_free=True))
    qppl = perplexity(qparams, cfg, TOKENS, seq_len=128)
    rel = abs(qppl - base) / base
    assert rel < limit, (base, qppl, rel)
