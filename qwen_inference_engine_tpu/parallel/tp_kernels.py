"""Tensor-parallel wrappers for the Pallas quant matmul (shard_map).

Pallas custom calls are not GSPMD-partitionable, so under a multi-device
mesh the engines currently fall back to partitionable XLA paths
(engine/engine.py). This module is the kernel-speed TP path: the quant
matmul runs per-shard inside ``jax.shard_map`` with the standard Megatron
sharding —

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

    lin.scales must shard the same way as q's K axis (group boundaries must
    align with the shard boundary: group_size * groups_per_shard == K_shard).
    """
    nd = lin.q.ndim
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
