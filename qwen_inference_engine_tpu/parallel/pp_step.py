"""Pipeline parallelism: layer-staged model sharding under shard_map.

The stacked-[L, ...] parameter pytree makes pipeline sharding natural on
TPU: every layer-stacked weight (and the [L, ...] KV cache) shards its
LAYER axis over a ``stage`` mesh axis, so stage ``s`` physically holds
only layers [s·L/S, (s+1)·L/S) — the memory-scaling axis for models too
large for one device even after TP, at 1/S of the weight+KV HBM per
device.

Execution (SPMD — every device runs the same program): the forward walks
``S`` hops; at hop ``h`` the residual stream is meaningful on stage
``h``, which runs its local layer scan and ``ppermute``s the stream to
stage ``h+1``; the other stages execute the same local forward on
don't-care data in the same wall-clock slot they would otherwise spend
idle (a sequential pipeline's bubble), and a masked select commits only
the active stage's KV-cache writes. Wall time therefore equals the
unsharded forward plus S permute hops. Interleaving M microbatches so
the bubbles carry real work (1F1B rotation) is the throughput extension
tracked in docs/ROADMAP.md; this v1 is the memory-scaling + correctness
demonstration the virtual mesh can validate.

The reference has no multi-device execution of any kind (SURVEY §2c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import (
    compute_logits,
    forward_hidden,
)
from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear

STAGE_AXIS = "stage"


def make_pp_mesh(n_devices=None, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (STAGE_AXIS,))


def supports_pp(cfg: ModelConfig, params: dict, stages: int) -> bool:
    return cfg.num_layers % stages == 0 and not cfg.is_moe


def pp_param_pspecs(params: dict) -> dict:
    """Layer-stacked leaves shard on the leading (layer) axis; global
    leaves (embed, final norm, rope, lm_head) replicate."""

    def layer_spec(leaf):
        if isinstance(leaf, Linear):
            return Linear(
                w=P(STAGE_AXIS, *([None] * (leaf.w.ndim - 1))),
                b=None if leaf.b is None else P(STAGE_AXIS, None))
        if isinstance(leaf, QuantLinear):
            return QuantLinear(
                q=P(STAGE_AXIS, *([None] * (leaf.q.ndim - 1))),
                scales=P(STAGE_AXIS, *([None] * (leaf.scales.ndim - 1))),
                b=None if leaf.b is None else P(STAGE_AXIS, None),
                bits=leaf.bits, group_size=leaf.group_size)
        return P(STAGE_AXIS, *([None] * (leaf.ndim - 1)))

    def repl_spec(leaf):
        if isinstance(leaf, Linear):
            return Linear(w=P(None, None),
                          b=None if leaf.b is None else P(None))
        if isinstance(leaf, QuantLinear):
            return QuantLinear(q=P(None, None), scales=P(None, None),
                               b=None if leaf.b is None else P(None),
                               bits=leaf.bits, group_size=leaf.group_size)
        return P(*([None] * leaf.ndim))

    specs = {
        "embed": P(None, None),
        "layers": {k: layer_spec(v) for k, v in params["layers"].items()},
        "final_norm": P(None),
        "rope_cos": P(None, None),
        "rope_sin": P(None, None),
    }
    if "lm_head" in params:
        specs["lm_head"] = repl_spec(params["lm_head"])
    return specs


def pp_cache_pspec(cache: KVCache) -> KVCache:
    kv = P(STAGE_AXIS, None, None, None, None)
    sc = P(STAGE_AXIS, None, None, None)
    return KVCache(
        k=kv, v=kv,
        k_scale=None if cache.k_scale is None else sc,
        v_scale=None if cache.v_scale is None else sc,
    )


def shard_for_pp(params: dict, cache: KVCache, mesh: Mesh):
    """device_put params/cache into the stage-sharded layouts."""
    pspec = pp_param_pspecs(params)
    cspec = pp_cache_pspec(cache)
    put = lambda leaf, spec: None if leaf is None else jax.device_put(
        leaf, NamedSharding(mesh, spec))
    return (jax.tree.map(put, params, pspec, is_leaf=lambda x: x is None),
            jax.tree.map(put, cache, cspec, is_leaf=lambda x: x is None))


def make_pp_forward_fn(cfg: ModelConfig, mesh: Mesh, params: dict,
                       cache: KVCache, *, use_pallas: bool = True,
                       uniform_decode: bool = False):
    """Returns ``fn(params, tokens, positions, lengths, cache) ->
    (last-token logits [B, V], cache)``; T>1 with positions from 0 is a
    fresh prefill, T==1 a decode step. Logits replicate across stages.
    """
    stages = mesh.shape[STAGE_AXIS]
    assert supports_pp(cfg, params, stages), (cfg.num_layers, stages)
    assert cache.k_scale is None, "INT8 KV under PP: not wired in v1"
    cfg_l = cfg.replace(num_layers=cfg.num_layers // stages)
    pspec = pp_param_pspecs(params)
    cspec = pp_cache_pspec(cache)
    fwd = [(s, (s + 1) % stages) for s in range(stages)]

    def body(params_l, tokens, positions, lengths, cache_l):
        sid = jax.lax.axis_index(STAGE_AXIS)
        B, T = tokens.shape
        x = jnp.take(params_l["embed"], tokens, axis=0)

        def hop(h, carry):
            x, kc, vc = carry
            lc = KVCache(k=kc, v=vc)
            hidden, lc2 = forward_hidden(
                params_l, cfg_l, tokens, positions, lc,
                fresh_prefill=(T > 1), use_pallas=use_pallas,
                uniform_decode=uniform_decode, inputs_embeds=x,
                apply_final_norm=False)
            active = sid == h
            # commit the KV writes (and the stream) on the active stage
            # only — the other stages ran on don't-care data in this
            # wall-clock slot (the sequential pipeline's bubble)
            kc = jnp.where(active, lc2.k, kc)
            vc = jnp.where(active, lc2.v, vc)
            x = jnp.where(active, hidden.astype(x.dtype), x)
            x = jax.lax.ppermute(x, STAGE_AXIS, fwd)
            return (x, kc, vc)

        x, kc, vc = jax.lax.fori_loop(
            0, stages, hop, (x, cache_l.k, cache_l.v))
        # the final residual stream landed back on stage 0; broadcast it
        x = jax.lax.psum(jnp.where(sid == 0, x, 0), STAGE_AXIS)
        from qwen_inference_engine_tpu.ops.norms import rms_norm

        x = rms_norm(x, params_l["final_norm"], cfg.rms_norm_eps)
        if T > 1:
            idx = (lengths - 1).astype(jnp.int32)
            last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        else:
            last = x[:, 0]
        logits = compute_logits(params_l, last, use_pallas)
        return logits, KVCache(k=kc, v=vc)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(), P(), P(), cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )
