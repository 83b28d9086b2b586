"""Grouped (MoE expert) quantized matmul: Pallas kernel vs dequant +
jax.lax.ragged_dot oracle, and the quantized MoE forward path.

The reference has no MoE and no quantization (its GEMM is the bf16 WMMA
loop, layers/src/matrix_mul.cu:165-288); these tests gate the baseline
mandate's "every dequant+matmul kernel" applied to expert stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear, dequantize
from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_linear
from tests.helpers import interpret_pallas


def _quant_experts(w, bits, gs):
    """[L, E, K, N] bf16 -> stacked QuantLinear via the production path."""
    return quantize_linear(Linear(w=jnp.asarray(w)), bits, gs, pad_free=True)


def _oracle(xs, qe, sizes, layer):
    wl = dequantize(
        QuantLinear(q=qe.q[layer], scales=qe.scales[layer], b=None,
                    bits=qe.bits, group_size=qe.group_size))
    wl = wl[:, : xs.shape[-1], :].astype(jnp.float32)
    return jax.lax.ragged_dot(xs.astype(jnp.float32), wl,
                              jnp.asarray(sizes, jnp.int32))


@pytest.mark.parametrize("bits,sizes", [
    (8, [0, 200, 7, 0, 93]),      # multi-tile expert, empties, straddles
    (8, [300, 0, 0, 0, 0]),       # one expert takes everything
    (4, [0, 200, 7, 0, 93]),
    (4, [37, 61, 64, 70, 68]),    # every tile straddles
])
def test_grouped_quant_matmul_matches_oracle(bits, sizes):
    import qwen_inference_engine_tpu.ops.grouped_matmul as gm

    L, E, K, N = 2, 5, 256, 256
    M = sum(sizes)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(L, E, K, N)).astype(np.float32) * (K ** -0.5)
    qe = _quant_experts(w, bits, 128)
    assert gm.grouped_quant_matmul_supported(qe, M)
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    layer = 1

    ref = np.asarray(_oracle(xs, qe, sizes, layer))
    with interpret_pallas(gm):
        got = gm.grouped_quant_matmul(
            xs, qe, jnp.asarray(sizes, jnp.int32), layer)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("sizes", [
    [0, 200, 7, 0, 93],
    [37, 61, 64, 70, 68],
])
def test_grouped_quant_matmul_a8_close(sizes):
    """W4A8 grouped kernel vs an explicit per-token-act-quant oracle."""
    import qwen_inference_engine_tpu.ops.grouped_matmul as gm
    from qwen_inference_engine_tpu.ops.quant_matmul import (
        quantize_activations,
    )

    L, E, K, N = 2, 5, 256, 256
    M = sum(sizes)
    rng = np.random.default_rng(4)
    w = rng.normal(size=(L, E, K, N)).astype(np.float32) * (K ** -0.5)
    qe = _quant_experts(w, 4, 128)
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    layer = 0

    xq, sx = quantize_activations(xs)
    ref = np.asarray(_oracle(xq.astype(jnp.float32) * sx, qe, sizes, layer))
    with interpret_pallas(gm):
        got = gm.grouped_quant_matmul(
            xs, qe, jnp.asarray(sizes, jnp.int32), layer, act_bits=8)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-2, atol=3e-2)


def test_grouped_quant_matmul_int8_per_group_scales():
    """Per-group (not per-channel) INT8 scales hit the per-tile path."""
    import qwen_inference_engine_tpu.ops.grouped_matmul as gm

    L, E, K, N = 1, 3, 256, 128
    sizes = [5, 0, 130]
    M = sum(sizes)
    rng = np.random.default_rng(5)
    w = rng.normal(size=(L, E, K, N)).astype(np.float32) * (K ** -0.5)
    qe = _quant_experts(w, 8, 128)
    assert qe.scales.shape[-2] == 2      # two k-groups
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    ref = np.asarray(_oracle(xs, qe, sizes, 0))
    with interpret_pallas(gm):
        got = gm.grouped_quant_matmul(xs, qe, jnp.asarray(sizes, jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


def test_worklist_construction():
    """The in-graph (tile, expert) schedule: coverage, disjointness, order."""
    from qwen_inference_engine_tpu.ops.grouped_matmul import _build_worklist

    tm = 16
    sizes = jnp.asarray([0, 40, 3, 0, 21], jnp.int32)   # M=64 -> 4 tiles
    eid, tid, rs, re, first = map(np.asarray, _build_worklist(sizes, 4, tm))
    n_items = len(eid)
    assert n_items == 4 + 5
    # every row covered exactly once, by its own expert
    starts = np.concatenate([[0], np.cumsum(np.asarray(sizes))])
    cover = np.zeros(64, int)
    for w in range(n_items):
        rows = np.arange(rs[w], re[w])
        cover[rows] += 1
        assert np.all(rows >= starts[eid[w]]) and np.all(rows < starts[eid[w] + 1])
        assert np.all(rows // tm == tid[w])
    np.testing.assert_array_equal(cover, 1)
    # tile ids nondecreasing; first flags exactly at tile changes
    assert np.all(np.diff(tid) >= 0)
    seen = set()
    for w in range(n_items):
        if rs[w] == re[w]:
            assert not first[w]
            continue
        if first[w]:
            assert tid[w] not in seen
        else:
            assert tid[w] in seen
        seen.add(tid[w])


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_params_covers_moe_experts(bits):
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.quant.quantize import quantize_params

    cfg = tiny_config(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(bits=bits, group_size=128,
                                             pad_free=True))
    for name in ("moe_gate", "moe_up", "moe_down"):
        qe = qp["layers"][name]
        assert isinstance(qe, QuantLinear) and qe.q.ndim == 4, name
        w = np.asarray(dequantize(qe), np.float32)
        ref = np.asarray(params["layers"][name], np.float32)
        err = np.abs(w[..., : ref.shape[-2], :] - ref).max()
        assert err < (0.02 if bits == 8 else 0.2), (name, err)
    assert isinstance(qp["layers"]["router"], Linear)  # kept bf16


@pytest.mark.parametrize("bits", [8, 4])
def test_moe_forward_quantized_close_to_bf16(bits):
    """Full MoE forward with quantized experts (XLA grouped fallback) stays
    close to the bf16 forward; and the Pallas grouped kernel (interpret)
    matches the XLA fallback tightly."""
    import qwen_inference_engine_tpu.ops.grouped_matmul as gm
    from qwen_inference_engine_tpu.config import tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import forward_hidden, init_params
    from qwen_inference_engine_tpu.quant.quantize import quantize_params

    cfg = tiny_config(num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=128)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(bits=bits, group_size=128,
                                             pad_free=True))
    rng = np.random.default_rng(2)
    B, T = 2, 8
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    def mk_cache():
        return KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                              cfg.head_dim, dtype=jnp.float32)

    ref, _ = forward_hidden(params, cfg, toks, positions, mk_cache(),
                            fresh_prefill=True, attn_impl="xla")
    got_xla, _ = forward_hidden(qp, cfg, toks, positions, mk_cache(),
                                fresh_prefill=True, attn_impl="xla",
                                use_pallas=False)
    # quantization error only (no kernel): int8 stays tight in max-abs;
    # int4 noise accumulates over every projection of both layers, so gate
    # on direction (cosine) instead of magnitude
    a = np.asarray(got_xla, np.float64).reshape(-1)
    r = np.asarray(ref, np.float64).reshape(-1)
    if bits == 8:
        assert np.abs(a - r).max() < 0.08
    else:
        cos = (a @ r) / (np.linalg.norm(a) * np.linalg.norm(r))
        # tiny random weights are the int4 worst case (no outlier structure
        # for absmax groups to adapt to); real-checkpoint accuracy is gated
        # by the ppl-delta tests (tests/test_ppl.py)
        assert cos > 0.9, cos

    with interpret_pallas(gm):
        got_k, _ = forward_hidden(qp, cfg, toks, positions, mk_cache(),
                                  fresh_prefill=True, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(got_xla),
                               rtol=2e-2, atol=2e-2)
