"""Expert-parallel serving step: the scheduler's paged decode / prefill
piece under ``jax.shard_map`` over an ``("ep",)`` mesh.

Sharding layout (the MoE analogue of tp_step.py's Megatron layout):

* expert weights ``layers.moe_{gate,up,down}``: sharded over the expert
  axis — each device holds E/ep experts; every other weight replicates;
* decode batch: SLOT-sharded over the ep axis (max_slots % ep == 0) —
  attention and the dense projections are fully local per shard, and the
  MoE block routes tokens through the all-to-all (parallel/ep_moe.py);
* paged KV pool: replicated STRUCTURE, divergent CONTENT — each shard
  writes only its own slots' pages and only ever reads those (a slot's
  rows never migrate), so no collective touches the pool;
* prefill pieces (single-slot): computed replicated on every shard (the
  all-to-all still routes each shard's copy correctly and identically),
  with the pool write masked to the slot's OWNER shard.

This is what makes MoE presets servable with continuous batching on an
expert-parallel mesh (VERDICT r3 #6) — greenfield vs the reference,
whose only multi-device token is one cudaSetDevice
(reference: layers/src/iengine.cu:55; SURVEY.md §2c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.models.qwen import (
    compute_logits,
    decode_step,
    forward_hidden,
)

EP_AXIS = "ep"
_MOE_KEYS = ("moe_gate", "moe_up", "moe_down")


def make_ep_mesh(n_devices=None, devices=None) -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EP_AXIS,))


def is_ep_mesh(mesh) -> bool:
    return (mesh is not None and getattr(mesh, "shape", None) is not None
            and dict(mesh.shape).get(EP_AXIS, 1) > 1)


def supports_ep(cfg: ModelConfig, mesh: Mesh, max_slots: int) -> bool:
    ep = dict(mesh.shape).get(EP_AXIS, 1)
    return (cfg.is_moe and ep > 1 and cfg.num_experts % ep == 0
            and max_slots % ep == 0)


def ep_param_pspecs(params: dict) -> dict:
    """Expert weights sharded on their expert axis (dim 1 of the
    layer-stacked tensors), everything else replicated."""
    def repl(leaf):
        return None if leaf is None else P(*([None] * leaf.ndim))

    def expert(leaf):
        return None if leaf is None else P(None, EP_AXIS,
                                           *([None] * (leaf.ndim - 2)))

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {
                name: jax.tree.map(expert if name in _MOE_KEYS else repl,
                                   leaf, is_leaf=lambda x: x is None)
                for name, leaf in v.items()
            }
        else:
            out[k] = jax.tree.map(repl, v, is_leaf=lambda x: x is None)
    return out


def ep_cache_pspecs(cache) -> object:
    """Replicated structure; content diverges per shard (each shard's
    writes cover only its own slots' pages). check_vma=False makes this
    legal under shard_map."""
    return jax.tree.map(
        lambda leaf: None if leaf is None else P(*([None] * leaf.ndim)),
        cache, is_leaf=lambda x: x is None)


def shard_for_ep(params: dict, mesh: Mesh):
    pspec = ep_param_pspecs(params)
    put = lambda leaf, spec: None if leaf is None else jax.device_put(
        leaf, NamedSharding(mesh, spec))
    return jax.tree.map(put, params, pspec, is_leaf=lambda x: x is None)


def make_ep_decode_fn(cfg: ModelConfig, mesh: Mesh, params: dict, cache,
                      *, use_pallas: bool = True, attn_impl: str = "auto"):
    """Returns ``fn(params, tok, pos, cache, tables) -> (logits [B, V],
    cache)`` with B slot-sharded over the ep axis; logits come out
    batch-sharded P("ep", None) and sampling runs outside (sample_rows
    partitions along the batch)."""
    pspec = ep_param_pspecs(params)
    cspec = ep_cache_pspecs(cache)

    def body(params_l, tok_l, pos_l, cache_l, tables_l):
        hidden, cache_l = forward_hidden(
            params_l, cfg, tok_l[:, None], pos_l[:, None], cache_l,
            block_tables=tables_l, fresh_prefill=False,
            use_pallas=use_pallas, attn_impl=attn_impl, ep_axis=EP_AXIS)
        return compute_logits(params_l, hidden[:, 0], use_pallas), cache_l

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(EP_AXIS), P(EP_AXIS), cspec, P(EP_AXIS, None)),
        out_specs=(P(EP_AXIS, None), cspec),
        check_vma=False,
    )


def make_ep_prefill_piece_fn(cfg: ModelConfig, mesh: Mesh, params: dict,
                             cache, *, T: int, first: bool, last: bool,
                             slots_per_shard: int,
                             use_pallas: bool = True,
                             attn_impl: str = "auto"):
    """Single-slot prefill chunk under the EP mesh.

    The [1, T] chunk is computed REPLICATED on every shard — the MoE
    all-to-all routes each shard's identical copy independently and
    returns identical outputs — and the pool write is masked to the
    slot's owner shard (ep× redundant compute for a 1-row chunk is far
    cheaper than reshaping the pool; this path exists for correctness on
    the virtual mesh and for small-chunk serving).

    Returns ``fn(params, tokens, start, nvalid, cache, tables, slot)``
    -> ``(logits [1, V], cache)`` when ``last`` else ``cache``."""
    pspec = ep_param_pspecs(params)
    cspec = ep_cache_pspecs(cache)

    def body(params_l, tokens, start, nvalid, cache_l, tables_l, slot):
        positions = start + jnp.arange(T, dtype=jnp.int32)[None, :]
        hidden, cache_new = forward_hidden(
            params_l, cfg, tokens, positions, cache_l,
            block_tables=tables_l, fresh_prefill=first,
            use_pallas=use_pallas, attn_impl=attn_impl, ep_axis=EP_AXIS)
        owner = (slot // slots_per_shard) == jax.lax.axis_index(EP_AXIS)
        cache_l = jax.tree.map(
            lambda new, old: jnp.where(owner, new, old), cache_new, cache_l)
        if not last:
            return cache_l
        idx = jnp.clip(nvalid - 1, 0, T - 1)
        h = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        logits = compute_logits(params_l, h, use_pallas)
        # CONTINUATION pieces (first=False) read the slot's cache prefix,
        # which exists only on the OWNER shard — the other shards computed
        # on garbage prefixes, so the replicated out-spec must carry the
        # owner's logits, not whichever shard's copy the runtime picks
        # (first pieces are prefix-free and identical everywhere, where
        # this select is a no-op)
        logits = jax.lax.psum(jnp.where(owner, logits, 0), EP_AXIS)
        return logits, cache_l

    out_specs = ((P(None, None), cspec) if last else cspec)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(None, None), P(), P(None), cspec,
                  P(None, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )


def make_ep_verify_fn(cfg: ModelConfig, mesh: Mesh, params: dict, cache,
                      *, T: int, use_pallas: bool = True,
                      attn_impl: str = "auto"):
    """Speculative VERIFY forward under the EP mesh: every slot scores its
    last accepted token + T-1 drafts in one pass (ragged per-row starts),
    slots sharded over the ep axis exactly like make_ep_decode_fn — the
    MoE all-to-all sees T× the tokens per round, amortizing the routing
    metadata. Returns ``fn(params, tokens [B, T], pos0 [B], cache,
    tables) -> (logits [B, T, V], cache)``."""
    pspec = ep_param_pspecs(params)
    cspec = ep_cache_pspecs(cache)

    def body(params_l, tokens_l, pos0_l, cache_l, tables_l):
        positions = pos0_l[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        hidden, cache_l = forward_hidden(
            params_l, cfg, tokens_l, positions, cache_l,
            block_tables=tables_l, fresh_prefill=False, ragged_multi=True,
            use_pallas=use_pallas, attn_impl=attn_impl, ep_axis=EP_AXIS)
        return compute_logits(params_l, hidden, use_pallas), cache_l

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(EP_AXIS, None), P(EP_AXIS), cspec,
                  P(EP_AXIS, None)),
        out_specs=(P(EP_AXIS, None, None), cspec),
        check_vma=False,
    )


def make_ep_spec_model_fn(cfg: ModelConfig, dcfg: ModelConfig, mesh: Mesh,
                          params: dict, dparams: dict, cache, dcache,
                          *, k: int, use_pallas: bool = True,
                          attn_impl: str = "auto"):
    """Fused draft-model speculation round under the EP mesh: a DENSE
    drafter's k+1 greedy decode steps feed the MoE target's T=k+1 verify
    forward inside one shard_map dispatch — the expert-parallel analogue
    of tp_step.make_tp_spec_model_fn (closes ROADMAP #8's remaining
    downgrade: draft-model speculation no longer falls back to
    prompt-lookup on EP meshes).

    Layout: slots sharded over the ep axis for BOTH models (the drafter
    is dense, so its weights replicate and each shard drafts for its own
    slots entirely locally — no collective until the target's MoE
    all-to-all); drafter page pool is replicated-structure /
    divergent-content exactly like the target's. Requires a dense
    drafter (``not dcfg.is_moe``): an MoE drafter would need its own
    all-to-all plumbing and real Qwen drafter pairs are dense (0.5B).

    Returns ``fn(params, dparams, tok_prev, tok_last, pos0, cache,
    dcache, tables) -> (logits [B,T,V] batch-sharded, cache, dcache,
    drafts [B,k])``; chain acceptance runs outside on the global logits
    (engine/scheduler._accept_chain), mirroring make_ep_verify_fn."""
    assert not dcfg.is_moe, "EP drafter must be a dense model"
    pspec = ep_param_pspecs(params)
    dpspec = ep_param_pspecs(dparams)   # dense drafter: all replicated
    cspec = ep_cache_pspecs(cache)
    dcspec = ep_cache_pspecs(dcache)

    def body(params_l, dparams_l, tok_prev, tok_last, pos0, cache_l,
             dcache_l, tables_l):
        def dstep(carry, i):
            cur, dc = carry
            tok_in = jnp.where(i == 0, tok_prev,
                               jnp.where(i == 1, tok_last, cur))
            logits, dc = decode_step(
                dparams_l, dcfg, tok_in, pos0 - 1 + i, dc,
                block_tables=tables_l, use_pallas=use_pallas,
                attn_impl=attn_impl)
            cur = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cur, dc), cur

        (_, dcache_l), ys = jax.lax.scan(
            dstep, (tok_last, dcache_l), jnp.arange(k + 1, dtype=jnp.int32))
        drafts = ys[1:].T                              # [B, k]
        tokens = jnp.concatenate([tok_last[:, None], drafts], axis=1)
        positions = pos0[:, None] + jnp.arange(k + 1,
                                               dtype=jnp.int32)[None, :]
        hidden, cache_l = forward_hidden(
            params_l, cfg, tokens, positions, cache_l,
            block_tables=tables_l, fresh_prefill=False, ragged_multi=True,
            use_pallas=use_pallas, attn_impl=attn_impl, ep_axis=EP_AXIS)
        logits = compute_logits(params_l, hidden, use_pallas)
        return logits, cache_l, dcache_l, drafts

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, dpspec, P(EP_AXIS), P(EP_AXIS), P(EP_AXIS),
                  cspec, dcspec, P(EP_AXIS, None)),
        out_specs=(P(EP_AXIS, None, None), cspec, dcspec,
                   P(EP_AXIS, None)),
        check_vma=False,
    )


def make_ep_prefill_batch_fn(cfg: ModelConfig, mesh: Mesh, params: dict,
                             cache, *, T: int, use_pallas: bool = True,
                             attn_impl: str = "auto"):
    """INTERIOR prefill pieces batched ONE PER SHARD under the EP mesh.

    The single-slot piece path computes every chunk replicated on all ep
    shards (ep× redundant); here each shard advances the piece of a slot
    it OWNS — tokens [ep, T] shard over the ep axis, so admission of ep
    concurrent long prompts costs one forward instead of ep. Interior
    pieces only (no sampling, exactly T tokens); first/last pieces stay
    on make_ep_prefill_piece_fn. Inactive shards ride along with a
    masked write (``active`` [ep] bool).

    Returns ``fn(params, tokens [ep, T], start [ep], cache,
    tables [ep, max_pages], active [ep]) -> cache``."""
    pspec = ep_param_pspecs(params)
    cspec = ep_cache_pspecs(cache)

    def body(params_l, tokens_l, start_l, cache_l, tables_l, active_l):
        positions = start_l[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        _, cache_new = forward_hidden(
            params_l, cfg, tokens_l, positions, cache_l,
            block_tables=tables_l, fresh_prefill=False,
            use_pallas=use_pallas, attn_impl=attn_impl, ep_axis=EP_AXIS)
        return jax.tree.map(
            lambda new, old: jnp.where(active_l[0], new, old),
            cache_new, cache_l)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(EP_AXIS, None), P(EP_AXIS), cspec,
                  P(EP_AXIS, None), P(EP_AXIS)),
        out_specs=cspec,
        check_vma=False,
    )
