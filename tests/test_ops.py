"""Unit tests for core ops against independent numpy oracles.

This is the test layer the reference lacks entirely (SURVEY.md §4): its only
oracle is a commented-out CPU embedding comparison
(reference: layers/src/embedded_matrix.cu:21-144); here every op gets one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.ops.attention import gqa_attention
from qwen_inference_engine_tpu.ops.linear import (
    Linear,
    QuantLinear,
    _quant_matmul_xla,
    apply_linear,
    dequantize,
    unpack_int4,
)
from qwen_inference_engine_tpu.ops.norms import rms_norm
from qwen_inference_engine_tpu.ops.rope import apply_rope, precompute_rope
from qwen_inference_engine_tpu.quant.quantize import pack_int4, quantize_linear


def test_rms_norm_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 17, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    eps = 1e-6
    expect = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_rope_rotate_half_oracle():
    """Independent numpy implementation of HF rotate-half RoPE."""
    d, theta = 32, 1e4
    B, T, H = 2, 5, 3
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, H, d)).astype(np.float32)
    positions = np.array([[3, 4, 5, 6, 7], [0, 1, 2, 3, 4]], dtype=np.int32)

    inv_freq = 1.0 / theta ** (np.arange(0, d // 2) * 2 / d)
    expect = np.empty_like(x)
    for b in range(B):
        for t in range(T):
            p = positions[b, t]
            ang = p * inv_freq  # [d/2]
            cos = np.concatenate([np.cos(ang), np.cos(ang)])
            sin = np.concatenate([np.sin(ang), np.sin(ang)])
            for h in range(H):
                v = x[b, t, h]
                rot = np.concatenate([-v[d // 2:], v[: d // 2]])
                expect[b, t, h] = v * cos + rot * sin

    cos_t, sin_t = precompute_rope(64, d, theta)
    got = apply_rope(jnp.asarray(x), jnp.asarray(positions), cos_t, sin_t)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_gqa_attention_oracle():
    """Loop-reference causal GQA attention."""
    B, T, S, Hq, Hk, D = 2, 3, 8, 4, 2, 16
    rng = np.random.default_rng(2)
    q = rng.normal(size=(B, T, Hq, D)).astype(np.float32)
    k = rng.normal(size=(B, S, Hk, D)).astype(np.float32)
    v = rng.normal(size=(B, S, Hk, D)).astype(np.float32)
    # queries at absolute positions 5,6,7 (decode-like continuation)
    q_pos = np.tile(np.array([5, 6, 7], dtype=np.int32), (B, 1))

    G = Hq // Hk
    expect = np.zeros((B, T, Hq, D), np.float32)
    for b in range(B):
        for t in range(T):
            for h in range(Hq):
                kh = h // G
                scores = (k[b, :, kh] @ q[b, t, h]) / np.sqrt(D)
                scores[np.arange(S) > q_pos[b, t]] = -np.inf
                p = np.exp(scores - scores.max())
                p /= p.sum()
                expect[b, t, h] = p @ v[b, :, kh]

    got = gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(q_pos))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(3)
    K, N, G = 256, 64, 64
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q), G)
    assert packed.shape == (K // 2, N)
    unpacked = unpack_int4(packed, G)
    np.testing.assert_array_equal(np.asarray(unpacked), q)


@pytest.mark.parametrize("bits,gs", [(8, None), (4, 64)])
def test_quantize_linear_accuracy(bits, gs):
    rng = np.random.default_rng(4)
    K, N = 256, 128
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    lin = Linear(jnp.asarray(w))
    qlin = quantize_linear(lin, bits, gs)
    wq = np.asarray(dequantize(qlin), np.float32)
    err = np.abs(wq - w).max() / np.abs(w).max()
    # int8: ~1/254 relative; int4 groupwise: ~1/14 of the group absmax
    assert err < (0.02 if bits == 8 else 0.12), err


@pytest.mark.parametrize("bits,gs", [(8, None), (4, 64)])
def test_quant_matmul_xla_matches_dequant(bits, gs):
    rng = np.random.default_rng(5)
    M, K, N = 4, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    qlin = quantize_linear(Linear(w), bits, gs)
    y_ref = x @ dequantize(qlin).astype(jnp.float32)
    y = _quant_matmul_xla(x, qlin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bits,gs", [(8, 128), (4, 128)])
def test_quant_matmul_pallas_interpret(bits, gs):
    """Pallas fused dequant matmul vs the XLA path (interpreter on CPU)."""
    from unittest import mock

    import qwen_inference_engine_tpu.ops.quant_matmul as qmm

    rng = np.random.default_rng(6)
    M, K, N = 8, 512, 256
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    qlin = quantize_linear(Linear(w), bits, gs)

    y_ref = np.asarray(_quant_matmul_xla(x.astype(jnp.float32), qlin), np.float32)

    orig = qmm.pl.pallas_call

    def interp_call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(qmm.pl, "pallas_call", interp_call):
        y = qmm.quant_matmul_pallas(x, qlin)
    np.testing.assert_allclose(np.asarray(y, np.float32), y_ref, rtol=5e-2, atol=5e-2)


def test_quantize_activations_roundtrip():
    from qwen_inference_engine_tpu.ops.quant_matmul import quantize_activations

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32) * 3.0)
    q, s = quantize_activations(x)
    assert q.dtype == jnp.int8 and s.shape == (5, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # round-to-nearest: error <= scale/2 per element
    assert (err <= np.asarray(s) / 2 + 1e-6).all()
    # all-zero row must not divide by zero
    q0, s0 = quantize_activations(jnp.zeros((1, 8)))
    assert np.asarray(q0).max() == 0 and np.isfinite(np.asarray(s0)).all()


@pytest.mark.parametrize("bits,gs", [(8, 128), (4, 128)])
def test_quant_matmul_xla_a8_close(bits, gs):
    """Activation quant adds bounded error on top of weight quant."""
    rng = np.random.default_rng(8)
    M, K, N = 4, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    qlin = quantize_linear(Linear(w), bits, gs)
    y_w = np.asarray(_quant_matmul_xla(x, qlin), np.float32)
    y_a8 = np.asarray(_quant_matmul_xla(x, qlin, act_bits=8), np.float32)
    scale = np.abs(y_w).max()
    assert np.abs(y_a8 - y_w).max() / scale < 0.03


@pytest.mark.parametrize("bits,gs", [(8, 128), (4, 128)])
def test_quant_matmul_pallas_a8_interpret(bits, gs):
    """W4A8/W8A8 Pallas kernels vs the XLA a8 path (same numerics)."""
    from unittest import mock

    import qwen_inference_engine_tpu.ops.quant_matmul as qmm

    rng = np.random.default_rng(9)
    M, K, N = 8, 512, 256
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    qlin = quantize_linear(Linear(w), bits, gs)

    y_ref = np.asarray(
        _quant_matmul_xla(x.astype(jnp.float32), qlin, act_bits=8), np.float32)

    orig = qmm.pl.pallas_call

    def interp_call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(qmm.pl, "pallas_call", interp_call):
        y = qmm.quant_matmul_pallas(x, qlin, act_bits=8)
    # same integer dots + f32 group scaling; differences are bf16-in vs
    # f32-in row scales and summation order
    np.testing.assert_allclose(np.asarray(y, np.float32), y_ref,
                               rtol=5e-2, atol=5e-2)


def test_apply_linear_bias():
    x = jnp.ones((2, 4), jnp.float32)
    lin = Linear(jnp.eye(4), jnp.arange(4.0))
    y = apply_linear(x, lin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + np.arange(4.0))
