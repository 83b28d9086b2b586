"""shard_map tensor-parallel quant matmul vs the unsharded reference
(virtual 8-device CPU mesh; the pallas kernel itself is covered by
test_ops — on CPU the per-shard call takes the XLA fallback, so this
validates the sharding/collective structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_inference_engine_tpu.ops.linear import QuantLinear, apply_linear
from qwen_inference_engine_tpu.parallel.mesh import make_mesh
from qwen_inference_engine_tpu.parallel.tp_kernels import (
    quant_matmul_tp_column,
    quant_matmul_tp_row,
)
from qwen_inference_engine_tpu.quant.quantize import quantize_linear
from qwen_inference_engine_tpu.ops.linear import Linear


def _mk(kin, out, gs, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(kin, out)).astype(np.float32) * 0.05)
    return quantize_linear(Linear(w), bits=4, group_size=gs)


@pytest.mark.parametrize("stacked", [False, True])
def test_tp_column_matches_unsharded(stacked):
    mesh = make_mesh((2, 4))
    kin, out, gs = 128, 256, 16
    lin = _mk(kin, out, gs)
    if stacked:
        lin = jax.tree.map(lambda a: jnp.stack([a, a * 0.5]), lin)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, kin)).astype(np.float32))
    layer = jnp.int32(1) if stacked else None
    y = quant_matmul_tp_column(x, lin, mesh, layer=layer)
    ref = apply_linear(x, lin, use_pallas=False, layer=layer)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_row_matches_unsharded():
    mesh = make_mesh((2, 4))
    kin, out, gs = 256, 128, 16   # K shard = 64 = 4 groups of 16
    lin = _mk(kin, out, gs, seed=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, kin)).astype(np.float32))
    y = quant_matmul_tp_row(x, lin, mesh)
    ref = apply_linear(x, lin, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_row_rejects_padded_k(devices8):
    """The advisor's verified failure: quantizer-padded K (kin=672, gs=16
    pads to a different K) must be REFUSED by the row-parallel wrapper
    instead of silently misaligning per-shard scale groups."""
    import numpy as np
    import pytest

    from qwen_inference_engine_tpu.ops.linear import Linear
    from qwen_inference_engine_tpu.quant.quantize import quantize_linear

    mesh = make_mesh((2, 4), devices=devices8)
    kin, out = 1376, 256  # kt = 1376/(2*32) = 21.5 -> padded to 22 tiles
    w = Linear(jnp.asarray(
        np.random.default_rng(0).normal(size=(kin, out)), jnp.float32))
    lin = quantize_linear(w, bits=4, group_size=32)
    assert lin.in_features != kin, "test needs a padded-K quantization"
    x = jnp.ones((8, kin), jnp.float32)
    with pytest.raises(AssertionError, match="pad_free"):
        quant_matmul_tp_row(x, lin, mesh)


def test_tp_row_pad_free_matches_dense(devices8):
    """pad_free + tp-aligned group size: row-parallel result matches the
    unsharded dequant matmul (the fixed path for the advisor finding)."""
    import numpy as np

    from qwen_inference_engine_tpu.ops.linear import Linear, dequantize
    from qwen_inference_engine_tpu.parallel.tp_step import (
        tp_aligned_group_size,
    )
    from qwen_inference_engine_tpu.quant.quantize import quantize_linear

    mesh = make_mesh((2, 4), devices=devices8)
    kin, out = 1024, 256
    gs = tp_aligned_group_size(kin, 4, 64, bits=4)
    w = Linear(jnp.asarray(
        np.random.default_rng(1).normal(size=(kin, out)), jnp.float32))
    lin = quantize_linear(w, bits=4, group_size=gs, pad_free=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, kin)),
                    jnp.float32)
    got = quant_matmul_tp_row(x, lin, mesh)
    want = x @ dequantize(lin).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)
