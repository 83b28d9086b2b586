"""Tensor-parallel PartitionSpecs for params and KV caches.

Megatron-style TP over the ``model`` mesh axis, expressed as NamedShardings
and left to GSPMD/pjit to turn into ICI collectives (the TPU-idiomatic
replacement for hand-written NCCL calls the reference never had,
SURVEY.md §2c / §5.8):

* q/k/v/gate/up projections: output(column)-sharded → activations arrive
  head-sharded with NO communication;
* o/down projections: input(row)-sharded → XLA inserts ONE psum per
  residual branch (2 all-reduces per layer, the TP minimum);
* embedding: vocab-sharded (gather + psum inserted by GSPMD);
* lm_head: vocab(out)-sharded → logits arrive vocab-sharded; sampling
  all-gathers only the top-k candidates, not the [B, V] logits;
* KV cache: sharded over kv-heads (falls back to head_dim when the axis
  doesn't divide the head count — q·k and p·v contractions then reduce over
  the sharded dim and GSPMD inserts the psum).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.kvcache.cache import KVCache, PagedKVCache
from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear

MODEL_AXIS = "model"
DATA_AXIS = "data"


def _linear_pspec(lin, shard: str, stacked: bool):
    """PartitionSpec tree for a Linear/QuantLinear.

    shard: 'out' (column parallel) or 'in' (row parallel).
    stacked: leaves carry a leading layer axis.
    """
    pre = (None,) if stacked else ()
    m = MODEL_AXIS
    if shard == "out":
        w_spec = P(*pre, None, m)
        b_spec = P(*pre, m)
        s_spec = P(*pre, None, m)   # scales [.., groups, out]
    else:  # 'in' — row parallel
        w_spec = P(*pre, m, None)
        b_spec = P(*pre, None)      # bias added after psum, replicated
        s_spec = P(*pre, m, None)   # scales groups follow the in axis
    if isinstance(lin, Linear):
        return Linear(w=w_spec, b=None if lin.b is None else b_spec)
    if isinstance(lin, QuantLinear):
        return QuantLinear(
            q=w_spec, scales=s_spec,
            b=None if lin.b is None else b_spec,
            bits=lin.bits, group_size=lin.group_size,
        )
    raise TypeError(type(lin))


def param_pspecs(params: dict) -> dict:
    """PartitionSpec pytree mirroring a model param pytree."""
    m = MODEL_AXIS
    layers = params["layers"]
    lspecs = {}
    for name, leaf in layers.items():
        if name in ("input_norm", "post_norm"):
            lspecs[name] = P(None, None)
        elif name in ("q_norm", "k_norm"):
            lspecs[name] = P(None, None)
        elif name in ("q", "k", "v", "gate", "up", "qkv", "gateup"):
            lspecs[name] = _linear_pspec(leaf, "out", stacked=True)
        elif name in ("o", "down"):
            lspecs[name] = _linear_pspec(leaf, "in", stacked=True)
        elif name == "router":
            # tiny and accuracy-critical: replicate
            lspecs[name] = Linear(w=P(None, None, None),
                                  b=None if leaf.b is None else P(None, None))
        elif name in ("moe_gate", "moe_up", "moe_down"):
            # expert parallelism: experts sharded over the model axis
            # (bf16 stacks [L, E, K, N] or quantized stacks whose q/scales
            # carry the expert axis at dim 1)
            if isinstance(leaf, QuantLinear):
                lspecs[name] = QuantLinear(
                    q=P(None, MODEL_AXIS, None, None),
                    scales=P(None, MODEL_AXIS, None, None),
                    b=None, bits=leaf.bits, group_size=leaf.group_size)
            else:
                lspecs[name] = P(None, MODEL_AXIS, None, None)
        else:
            raise KeyError(name)
    specs = {
        "embed": P(m, None),          # vocab-sharded (Megatron embedding)
        "layers": lspecs,
        "final_norm": P(None),
        "rope_cos": P(None, None),
        "rope_sin": P(None, None),
    }
    if "lm_head" in params:
        specs["lm_head"] = _linear_pspec(params["lm_head"], "out", stacked=False)
    return specs


def cache_pspecs(cache, mesh: Mesh):
    """PartitionSpec pytree for a KVCache/PagedKVCache.

    KV is sharded over kv-heads when the model axis divides them, else over
    head_dim (Dh=128 divides any practical axis size); scales follow.
    """
    m_size = mesh.shape[MODEL_AXIS]
    if isinstance(cache, PagedKVCache):
        hk = cache.k_pages.shape[2]  # [L, P, Hk, page, D]
        on_heads = hk % m_size == 0
        kv = P(None, None, MODEL_AXIS, None, None) if on_heads else \
             P(None, None, None, None, MODEL_AXIS)
        sc = P(None, None, MODEL_AXIS, None) if on_heads else P(None, None, None, None)
        return PagedKVCache(
            k_pages=kv, v_pages=kv,
            k_scale=None if cache.k_scale is None else sc,
            v_scale=None if cache.v_scale is None else sc,
            page_size=cache.page_size,
        )
    hk = cache.k.shape[2]
    on_heads = hk % m_size == 0
    kv = P(None, DATA_AXIS, MODEL_AXIS, None, None) if on_heads else \
         P(None, DATA_AXIS, None, None, MODEL_AXIS)
    sc = P(None, DATA_AXIS, MODEL_AXIS, None) if on_heads else P(None, DATA_AXIS, None, None)
    return KVCache(
        k=kv, v=kv,
        k_scale=None if cache.k_scale is None else sc,
        v_scale=None if cache.v_scale is None else sc,
    )


def _tree_map_specs(tree, specs, fn):
    return jax.tree.map(fn, tree, specs,
                        is_leaf=lambda x: x is None)


def fit_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop sharding on axes the mesh doesn't divide (e.g. few quant-scale
    groups, odd head counts) — degrade to replicated on that axis only."""
    fitted = []
    for i, axis in enumerate(spec):
        if axis is None:
            fitted.append(None)
            continue
        names = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for nm in names:
            size *= mesh.shape[nm]
        fitted.append(axis if shape[i] % size == 0 else None)
    return P(*fitted)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put every param leaf to its NamedSharding on ``mesh``."""
    specs = param_pspecs(params)

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(
            leaf, NamedSharding(mesh, fit_spec(leaf.shape, spec, mesh))
        )

    return _tree_map_specs(params, specs, put)


def shard_params_with_fn(params: dict, sharding_fn: Callable) -> dict:
    """Place leaves via a user fn (leaf, pspec) -> placed leaf."""
    specs = param_pspecs(params)
    return _tree_map_specs(
        params, specs,
        lambda leaf, spec: None if leaf is None else sharding_fn(leaf, spec),
    )


def make_sharded_cache(
    cache_template, mesh: Optional[Mesh]
):
    """Allocate a cache directly with its sharded layout (no host copy)."""
    if mesh is None:
        return cache_template
    specs = cache_pspecs(cache_template, mesh)

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(
            leaf, NamedSharding(mesh, fit_spec(leaf.shape, spec, mesh))
        )

    return _tree_map_specs(cache_template, specs, put)
