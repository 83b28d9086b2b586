"""Per-projection tensor-parallel wrappers for the Pallas quant matmul.

STATUS: superseded as the engine path by ``parallel/tp_step.py``, which
runs the ENTIRE step inside one ``jax.shard_map`` (these wrappers would
re-enter shard_map per projection). They remain as the minimal,
separately-testable building blocks — with hard guards against the
padded-K/group-misalignment hazards a naive row split hits (see
quant_matmul_tp_row) — and as the reference for the sharding algebra:

* **column parallel** (q/k/v/gate/up): weights sharded on the OUTPUT axis,
  activations replicated, output sharded — no collective;
* **row parallel** (o/down): weights sharded on the REDUCTION axis,
  activations sharded (the preceding column-parallel output), partial
  products ``psum``-reduced over the model axis.

The pair (column -> row) needs exactly one all-reduce per projection pair,
the TP recipe the reference never had (SURVEY.md section 2c).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.ops.linear import QuantLinear
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas

MODEL_AXIS = "model"


def _local(lin: QuantLinear, q, scales, b=None) -> QuantLinear:
    return dataclasses.replace(lin, q=q, scales=scales, b=b)


def quant_matmul_tp_column(x, lin: QuantLinear, mesh: Mesh, layer=None):
    """x replicated, lin.q/scales sharded on the output (last) axis.

    Returns y sharded on the output axis (spec P(..., MODEL_AXIS)); any
    bias is added on the logical (sharded) result afterwards.
    """
    nd = lin.q.ndim  # 2 or 3 (stacked)
    w_spec = P(*([None] * (nd - 1)), MODEL_AXIS)
    out_spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)

    def fn(x_l, q_l, s_l):
        return quant_matmul_pallas(x_l, _local(lin, q_l, s_l, None),
                                   layer=layer)

    y = jax.shard_map(fn, mesh=mesh, in_specs=(P(), w_spec, w_spec),
                      out_specs=out_spec)(x, lin.q, lin.scales)
    if lin.b is not None:
        b = lin.b[layer] if layer is not None else lin.b
        y = y + b.astype(y.dtype)
    return y


def quant_matmul_tp_row(x, lin: QuantLinear, mesh: Mesh, layer=None):
    """x sharded on its last (reduction) axis, lin sharded on the input
    axis; output replicated via psum over the model axis.

    Requires an UNPADDED, shard-aligned quantization: the quantizer may
    pad K (quantize_linear's odd-tile rule — e.g. 7B down-proj
    18944→19456), and sharding padded weight rows against logical-K
    activations misaligns every shard's scale groups (verified wrong/
    crashing). Quantize with ``QuantConfig(pad_free=True)`` and a group
    size from ``parallel.tp_step.tp_aligned_group_size``. The full-step
    shard_map path (parallel/tp_step.py) enforces the same invariants via
    ``supports_tp``.
    """
    nd = lin.q.ndim
    tp = mesh.shape[MODEL_AXIS]
    k_logical = x.shape[-1]
    unit = 2 if lin.bits == 4 else 1
    assert lin.in_features == k_logical, (
        f"padded-K quantization (K={lin.in_features} vs logical "
        f"{k_logical}) cannot be row-sharded; requantize pad_free")
    assert k_logical % tp == 0 and (k_logical // tp) % (unit * lin.group_size) == 0, (
        f"row shards of K={k_logical} at tp={tp} straddle "
        f"group_size={lin.group_size} boundaries; use tp_aligned_group_size")
    w_spec = P(*([None] * (nd - 2)), MODEL_AXIS, None)
    x_spec = P(*([None] * (x.ndim - 1)), MODEL_AXIS)

    def fn(x_l, q_l, s_l):
        y = quant_matmul_pallas(x_l, _local(lin, q_l, s_l, None), layer=layer)
        y = jax.lax.psum(y, MODEL_AXIS)
        if lin.b is not None:
            b = lin.b[layer] if layer is not None else lin.b
            y = y + b.astype(y.dtype)
        return y

    return jax.shard_map(fn, mesh=mesh, in_specs=(x_spec, w_spec, w_spec),
                         out_specs=P())(x, lin.q, lin.scales)
