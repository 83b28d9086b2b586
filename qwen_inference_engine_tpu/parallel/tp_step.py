"""Kernel-speed tensor parallelism: the FULL decode/prefill step under
``jax.shard_map``.

Pallas custom calls are not GSPMD-partitionable, so the NamedSharding/GSPMD
path (parallel/sharding.py) must swap every kernel for a partitionable XLA
op — correct, but it gives up the measured kernel speed (docs/PERF.md).
This module instead runs the *whole* transformer step inside ``shard_map``:
each device executes the ordinary single-chip forward (models/qwen.py —
Pallas quant matmul, flash decode attention, tile-RMW KV append) on its
LOCAL shard, with the Megatron collectives issued explicitly:

* q/k/v/gate/up: column-parallel (output axis sharded) — no collective;
* o/down: row-parallel — ONE ``psum`` each per layer
  (``forward_hidden(reduce_axis=...)``);
* KV cache + attention: sharded over KV heads — attention is fully local;
* embedding/lm_head: vocab-sharded (masked lookup + psum; logits leave the
  step vocab-sharded and sampling runs on the sharded logits outside).

The local shard of the model is described by a LOCAL config (heads divided
by tp); weight shards are plain slices, so a shard of a stacked
``QuantLinear`` is itself a valid ``QuantLinear`` as long as the shard
boundaries align with quantization group boundaries — see
``tp_aligned_group_size`` and quant/quantize.py.

TPU analogue of the multi-GPU layer the reference never had (its only
multi-device token is a single ``cudaSetDevice``, reference:
layers/src/iengine.cu:55; SURVEY.md §2c makes TP a mandate for this build).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache, PagedKVCache
from qwen_inference_engine_tpu.models.qwen import (
    compute_logits,
    decode_step,
    forward_hidden,
    prefill_chunked,
)
from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear
from qwen_inference_engine_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    cache_pspecs,
    param_pspecs,
)


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """The per-shard view of the model: heads divided over the model axis.

    hidden_size stays global (the residual stream is replicated);
    intermediate_size is only used for initialization, the forward reads
    shard shapes from the weights themselves.
    """
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    return cfg.replace(num_heads=cfg.num_heads // tp,
                       num_kv_heads=cfg.num_kv_heads // tp,
                       intermediate_size=cfg.intermediate_size // tp)


def tp_aligned_group_size(k_logical: int, tp: int, group_size: int,
                          bits: int) -> int:
    """Largest group size ≤ ``group_size`` whose groups (and, for INT4,
    plane-pairs = 2 groups) never straddle a row-parallel shard boundary:
    required so a plain slice of (q, scales) is a valid local QuantLinear.
    """
    assert k_logical % tp == 0, (k_logical, tp)
    k_local = k_logical // tp
    gs = group_size
    unit = 2 if bits == 4 else 1
    while gs > 2 and k_local % (unit * gs):
        gs //= 2
    return gs


def supports_tp(cfg: ModelConfig, params: dict, tp: int) -> bool:
    """Whether the param pytree can be shard_map-split at this tp degree."""
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        return False
    layers = params["layers"]
    if "moe_gate" in layers:
        # MoE: TP attention + expert-sharded MLP (replicated-activation
        # EP; moe_mlp(reduce_axis=...)) — experts must split evenly
        if cfg.num_experts % tp:
            return False
        o = layers["o"]
        ok = (o.w.shape[-2] if isinstance(o, Linear) else o.q.shape[-2])
        if isinstance(o, QuantLinear) and o.scales.shape[-2] % tp:
            return False  # row-parallel scales must split on the k groups
        return ok % tp == 0 and o.b is None
    if "gate" not in layers:
        return False
    if "qkv" in layers or "gateup" in layers:
        # offline-fused projections interleave head/FFN columns; TP needs
        # the split layout (quantize without fuse_projections)
        return False
    for name in ("q", "k", "v", "gate", "up"):
        lin = layers[name]
        n = lin.w.shape[-1] if isinstance(lin, Linear) else lin.out_features
        if n % tp:
            return False
    for name in ("o", "down"):
        lin = layers[name]
        k = lin.w.shape[-2] if isinstance(lin, Linear) else lin.q.shape[-2]
        if k % tp:
            return False
        if lin.b is not None:
            return False  # row-parallel bias would be psum-multiplied
        if isinstance(lin, QuantLinear):
            # groups (scales rows) and packed rows must split evenly, and
            # the local K must still satisfy the packing invariants
            if lin.scales.shape[-2] % tp:
                return False
            unit = 2 if lin.bits == 4 else 1
            if (lin.in_features // tp) % (unit * lin.group_size):
                return False
    head = params.get("lm_head")
    if head is not None:
        n = head.w.shape[-1] if isinstance(head, Linear) else head.out_features
        if n % tp:
            return False
    if params["embed"].shape[0] % tp:
        return False
    return True


def _spec_tree(params: dict, cache, mesh: Mesh):
    pspec = param_pspecs(params)
    cspec = cache_pspecs(cache, mesh)
    return pspec, cspec


def shard_for_tp(params: dict, cache, mesh: Mesh):
    """device_put params and cache into the exact layouts the shard_map
    step consumes (same specs — no resharding at dispatch)."""
    pspec, cspec = _spec_tree(params, cache, mesh)
    put = lambda leaf, spec: None if leaf is None else jax.device_put(
        leaf, NamedSharding(mesh, spec))
    params_s = jax.tree.map(put, params, pspec,
                            is_leaf=lambda x: x is None)
    cache_s = jax.tree.map(put, cache, cspec,
                           is_leaf=lambda x: x is None)
    return params_s, cache_s


def make_tp_decode_fn(cfg: ModelConfig, mesh: Mesh, params: dict, cache,
                      *, use_pallas: bool = True, attn_impl: str = "auto",
                      uniform_decode: bool = False, paged: bool = False):
    """Returns ``fn(params, tok, pos, cache[, tables]) -> (logits_sharded,
    cache)`` running the single-chip kernels per shard. ``logits`` come out
    vocab-sharded over the model axis (P(data, model)); sampling ops are
    XLA and partition fine on the sharded logits.

    paged: the cache is a PagedKVCache and the fn takes block tables as a
    5th argument. The page pool is a global resource, so the paged path
    requires a pure-TP mesh (data axis size 1); slots/tables replicate.
    """
    tp = mesh.shape[MODEL_AXIS]
    cfg_l = local_config(cfg, tp)
    pspec, cspec = _spec_tree(params, cache, mesh)

    if paged:
        assert mesh.shape.get(DATA_AXIS, 1) == 1, \
            "paged TP needs a pure-TP mesh (shared page pool)"

        def body_paged(params_l, tok_l, pos_l, cache_l, tables_l):
            return decode_step(
                params_l, cfg_l, tok_l, pos_l, cache_l,
                block_tables=tables_l,
                use_pallas=use_pallas, attn_impl=attn_impl,
                uniform_decode=uniform_decode, reduce_axis=MODEL_AXIS)

        return jax.shard_map(
            body_paged, mesh=mesh,
            in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS), cspec, P(None, None)),
            out_specs=(P(DATA_AXIS, MODEL_AXIS), cspec),
            check_vma=False,
        )

    def body(params_l, tok_l, pos_l, cache_l):
        return decode_step(
            params_l, cfg_l, tok_l, pos_l, cache_l,
            use_pallas=use_pallas, attn_impl=attn_impl,
            uniform_decode=uniform_decode, reduce_axis=MODEL_AXIS)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, MODEL_AXIS), cspec),
        check_vma=False,
    )


def make_tp_verify_fn(cfg: ModelConfig, mesh: Mesh, params: dict, cache,
                      *, T: int, use_pallas: bool = True,
                      attn_impl: str = "auto"):
    """Speculative verify forward (T = spec_k+1 consecutive fresh tokens
    per slot, ragged per-row starts) over the paged cache under TP.

    Returns ``fn(params, tokens[B,T], pos0[B], cache, tables) ->
    (logits [B, T, V] vocab-sharded, cache)``; the accept/sample chain
    runs outside on the sharded logits (engine/scheduler._jit_verify).
    Per shard this is the ordinary single-chip verify path (multi-query
    paged attention + ragged-T append on the local KV heads)."""
    tp = mesh.shape[MODEL_AXIS]
    cfg_l = local_config(cfg, tp)
    pspec, cspec = _spec_tree(params, cache, mesh)
    assert mesh.shape.get(DATA_AXIS, 1) == 1, \
        "paged TP needs a pure-TP mesh (shared page pool)"

    def body(params_l, tokens_l, pos0, cache_l, tables_l):
        positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        hidden, cache_l = forward_hidden(
            params_l, cfg_l, tokens_l, positions, cache_l,
            block_tables=tables_l, fresh_prefill=False, ragged_multi=True,
            use_pallas=use_pallas, attn_impl=attn_impl,
            reduce_axis=MODEL_AXIS)
        return compute_logits(params_l, hidden, use_pallas), cache_l

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS, None), P(DATA_AXIS), cspec,
                  P(None, None)),
        out_specs=(P(DATA_AXIS, None, MODEL_AXIS), cspec),
        check_vma=False,
    )


def _sharded_argmax(logits_l: jax.Array, axis_name: str) -> jax.Array:
    """argmax over a vocab axis sharded across ``axis_name``; global ids.

    Tie semantics match single-device argmax (globally lowest index):
    each shard reports its local (max, argmax+offset); the first shard
    attaining the global max wins, and within a shard argmax already
    picks the lowest local index."""
    v_l = logits_l.shape[-1]
    off = jax.lax.axis_index(axis_name) * v_l
    lmax = logits_l.max(-1)
    larg = jnp.argmax(logits_l, -1).astype(jnp.int32) + off
    allmax = jax.lax.all_gather(lmax, axis_name)     # [tp, B]
    allarg = jax.lax.all_gather(larg, axis_name)
    best = jnp.argmax(allmax, axis=0)                # [B]
    return jnp.take_along_axis(allarg, best[None, :], axis=0)[0]


def make_tp_spec_model_fn(cfg: ModelConfig, dcfg: ModelConfig, mesh: Mesh,
                          params: dict, dparams: dict, cache, dcache,
                          *, k: int, use_pallas: bool = True,
                          attn_impl: str = "auto"):
    """Fused draft-model speculation round under TP: the drafter's k+1
    greedy decode steps (lax.scan over the LOCAL drafter shard, cross-
    shard argmax on its vocab-sharded logits) feed the target's T=k+1
    verify forward — all inside ONE shard_map dispatch, so draft-model
    speculation keeps kernel speed under TP exactly like plain decode
    (closes the scheduler's r3 prompt-lookup fallback, VERDICT r3 #4).

    Returns ``fn(params, dparams, tok_prev, tok_last, pos0, cache,
    dcache, tables) -> (logits [B,T,V] vocab-sharded, cache, dcache,
    drafts [B,k])``; chain acceptance runs outside on the sharded logits
    (engine/scheduler._accept_chain), mirroring make_tp_verify_fn."""
    tp = mesh.shape[MODEL_AXIS]
    cfg_l = local_config(cfg, tp)
    dcfg_l = local_config(dcfg, tp)
    pspec, cspec = _spec_tree(params, cache, mesh)
    dpspec, dcspec = _spec_tree(dparams, dcache, mesh)
    assert mesh.shape.get(DATA_AXIS, 1) == 1, \
        "paged TP needs a pure-TP mesh (shared page pool)"

    def body(params_l, dparams_l, tok_prev, tok_last, pos0, cache_l,
             dcache_l, tables_l):
        def dstep(carry, i):
            cur, dc = carry
            tok_in = jnp.where(i == 0, tok_prev,
                               jnp.where(i == 1, tok_last, cur))
            logits, dc = decode_step(
                dparams_l, dcfg_l, tok_in, pos0 - 1 + i, dc,
                block_tables=tables_l, use_pallas=use_pallas,
                attn_impl=attn_impl, reduce_axis=MODEL_AXIS)
            cur = _sharded_argmax(logits, MODEL_AXIS)
            return (cur, dc), cur

        (_, dcache_l), ys = jax.lax.scan(
            dstep, (tok_last, dcache_l), jnp.arange(k + 1, dtype=jnp.int32))
        drafts = ys[1:].T                              # [B, k]
        tokens = jnp.concatenate([tok_last[:, None], drafts], axis=1)
        positions = pos0[:, None] + jnp.arange(k + 1,
                                               dtype=jnp.int32)[None, :]
        hidden, cache_l = forward_hidden(
            params_l, cfg_l, tokens, positions, cache_l,
            block_tables=tables_l, fresh_prefill=False, ragged_multi=True,
            use_pallas=use_pallas, attn_impl=attn_impl,
            reduce_axis=MODEL_AXIS)
        logits = compute_logits(params_l, hidden, use_pallas)
        return logits, cache_l, dcache_l, drafts

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, dpspec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  cspec, dcspec, P(None, None)),
        out_specs=(P(DATA_AXIS, None, MODEL_AXIS), cspec, dcspec,
                   P(DATA_AXIS, None)),
        check_vma=False,
    )


def make_tp_prefill_fn(cfg: ModelConfig, mesh: Mesh, params: dict, cache,
                       *, chunk: int = 512, use_pallas: bool = True,
                       attn_impl: str = "auto"):
    """Returns ``fn(params, tokens, lengths, cache) -> (logits_sharded,
    cache)`` — chunked prefill with per-shard kernels."""
    tp = mesh.shape[MODEL_AXIS]
    cfg_l = local_config(cfg, tp)
    pspec, cspec = _spec_tree(params, cache, mesh)

    def body(params_l, tokens_l, lengths_l, cache_l):
        return prefill_chunked(
            params_l, cfg_l, tokens_l, lengths_l, cache_l, chunk=chunk,
            use_pallas=use_pallas, attn_impl=attn_impl,
            reduce_axis=MODEL_AXIS)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS, None), P(DATA_AXIS), cspec),
        out_specs=(P(DATA_AXIS, MODEL_AXIS), cspec),
        check_vma=False,
    )


def make_tp_prefill_piece_fn(cfg: ModelConfig, mesh: Mesh, params: dict,
                             cache, *, T: int, first: bool, last: bool,
                             use_pallas: bool = True,
                             attn_impl: str = "auto"):
    """One chunk of a paged per-slot prefill (scheduler tick) under TP.

    Returns ``fn(params, tokens[1,T], start, nvalid[1], cache, tables[1,·])
    -> (logits_sharded | None, cache)`` — the shard_map analogue of
    ContinuousBatchingEngine._jit_prefill_piece's forward; sampling runs
    on the vocab-sharded logits outside."""
    tp = mesh.shape[MODEL_AXIS]
    cfg_l = local_config(cfg, tp)
    pspec, cspec = _spec_tree(params, cache, mesh)
    assert mesh.shape.get(DATA_AXIS, 1) == 1, \
        "paged TP needs a pure-TP mesh (shared page pool)"

    def body(params_l, tokens_l, start, nvalid, cache_l, tables_l):
        positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
        hidden, cache_l = forward_hidden(
            params_l, cfg_l, tokens_l, positions, cache_l,
            block_tables=tables_l, fresh_prefill=first,
            use_pallas=use_pallas, attn_impl=attn_impl,
            reduce_axis=MODEL_AXIS)
        if not last:
            return cache_l
        idx = jnp.clip(nvalid - 1, 0, T - 1)
        h = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        return compute_logits(params_l, h, use_pallas), cache_l

    out = ((P(DATA_AXIS, MODEL_AXIS), cspec) if last else cspec)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS, None), P(), P(DATA_AXIS), cspec,
                  P(None, None)),
        out_specs=out,
        check_vma=False,
    )
