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
