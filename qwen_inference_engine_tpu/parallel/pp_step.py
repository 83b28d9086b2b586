"""Pipeline parallelism: layer-staged model sharding under shard_map.

The stacked-[L, ...] parameter pytree makes pipeline sharding natural on
TPU: every layer-stacked weight (and the [L, ...] KV cache) shards its
LAYER axis over a ``stage`` mesh axis, so stage ``s`` physically holds
only layers [s·L/S, (s+1)·L/S) — the memory-scaling axis for models too
large for one device even after TP, at 1/S of the weight+KV HBM per
device.

Two execution modes (SPMD — every device runs the same program):

* ``make_pp_forward_fn`` — sequential single-stream forward: at hop
  ``h`` the residual stream is meaningful on stage ``h``, which runs its
  local layer scan and ``ppermute``s the stream onward; a masked select
  commits only the active stage's KV writes. Wall time = unsharded
  forward + S permute hops (the other stages compute don't-care data in
  the slots a sequential pipeline leaves as bubbles).
* ``make_pp_decode_1f1b`` — microbatched decode with M == S microbatches
  rotating through the ring: after an S-tick warmup every tick completes
  one token somewhere (zero steady-state bubbles); stage s works on
  microbatch (t-s) mod M at step (t-s)//M, and the completed stream
  arrives back at stage 0 exactly when that microbatch's next token must
  start. Greedy-exact vs the single-device decode (tested).

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
    cfg_l = cfg.replace(num_layers=cfg.num_layers // stages)
    pspec = pp_param_pspecs(params)
    cspec = pp_cache_pspec(cache)
    fwd = [(s, (s + 1) % stages) for s in range(stages)]

    def body(params_l, tokens, positions, lengths, cache_l):
        sid = jax.lax.axis_index(STAGE_AXIS)
        B, T = tokens.shape
        x = jnp.take(params_l["embed"], tokens, axis=0)

        def hop(h, carry):
            x, lc = carry
            hidden, lc2 = forward_hidden(
                params_l, cfg_l, tokens, positions, lc,
                fresh_prefill=(T > 1), use_pallas=use_pallas,
                uniform_decode=uniform_decode, inputs_embeds=x,
                apply_final_norm=False)
            active = sid == h
            # commit the KV writes (and the stream) on the active stage
            # only — the other stages ran on don't-care data in this
            # wall-clock slot (the sequential pipeline's bubble)
            lc = jax.tree.map(lambda a, b: jnp.where(active, a, b), lc2, lc)
            x = jnp.where(active, hidden.astype(x.dtype), x)
            x = jax.lax.ppermute(x, STAGE_AXIS, fwd)
            return (x, lc)

        x, cache_l = jax.lax.fori_loop(0, stages, hop, (x, cache_l))
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
        return logits, cache_l

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(), P(), P(), cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )


# ----------------------------------------------------------------------
# 1F1B microbatched pipeline DECODE: with M == stages microbatches, the
# warmup fills the pipeline in S ticks and then every tick completes one
# token somewhere — zero bubbles in steady state. Stage s processes
# microbatch (t - s) mod M at tick t; the completed stream arrives back
# at stage 0 exactly when that microbatch's next token must start, so
# sampling feeds the ring without a stall. Greedy-only v1; per-tick cache
# row windows are dynamic-sliced (the zero-copy variant needs the row
# offset in the kernels' scalar prefetch — ROADMAP).
# ----------------------------------------------------------------------

def make_pp_decode_1f1b(cfg: ModelConfig, mesh: Mesh, params: dict,
                        cache: KVCache, *, microbatch_rows: int,
                        steps: int, use_pallas: bool = False,
                        zero_copy_cache: bool | None = None,
                        sampled: bool = False, k_cap: int = 64,
                        approx_top_k: bool = False,
                        penalized: bool = False):
    """Returns ``fn(params, init_toks [M, b], init_pos [M], cache) ->
    (tokens [steps, M, b] int32, cache)`` — greedy decode of ``steps``
    tokens for every microbatch, pipelined across the stages.

    sampled=True: IN-PIPELINE dynamic sampling (ROADMAP #9) — the fn
    takes two extra args ``(rkey, sp_dyn)`` with sp_dyn leaves [M, b]
    (per-row temperature/top_p/top_k/greedy), and stage 0 runs
    ``sample_rows`` on each arriving microbatch between hops, so mixed
    stochastic waves ride the zero-bubble pipeline instead of paying the
    full S-hop bubble per token (the per-tick sampled path).

    penalized=True (requires sampled): repetition/presence-penalty rows
    ride the pipeline too — the fn takes one more arg ``seen [M, b, V]``
    (bool, prompt+generated vocab mask) carried through the tick scan:
    stage 0 samples each arriving microbatch against its slice of the
    mask and marks the sampled token, so a row never waits for a host
    round-trip to see its own history. Returns ``(tokens, cache, seen)``.
    Only stage 0's mask trajectory is meaningful (other stages sample
    garbage logits that never feed back); the scan output replicates
    stage 0's mask the same way emitted tokens are replicated.

    zero_copy_cache (default: follow use_pallas): pass the FULL local
    cache into forward_hidden with ``cache_row0`` so the per-tick
    microbatch row window rides the kernels' scalar prefetch — the
    dynamic-slice/update pair otherwise copies the whole [L/S, b, Hk, S,
    D] window twice per tick (ROADMAP #6)."""
    stages = mesh.shape[STAGE_AXIS]
    M = stages
    b = microbatch_rows
    if zero_copy_cache is None:
        zero_copy_cache = use_pallas
    assert supports_pp(cfg, params, stages)
    assert not penalized or sampled, "penalized requires sampled=True"
    assert cache.k.shape[1] == M * b, (cache.k.shape, M, b)
    cfg_l = cfg.replace(num_layers=cfg.num_layers // stages)
    pspec = pp_param_pspecs(params)
    cspec = pp_cache_pspec(cache)
    fwd = [(s, (s + 1) % stages) for s in range(stages)]
    n_ticks = stages + steps * M
    from qwen_inference_engine_tpu.ops.norms import rms_norm

    def body(params_l, init_toks, init_pos, cache_l, rkey=None,
             sp_dyn=None, seen0=None):
        sid = jax.lax.axis_index(STAGE_AXIS)
        D = cfg.hidden_size

        def tick(carry, t):
            if penalized:
                x, lc, sn = carry
            else:
                x, lc = carry
            m0 = jnp.mod(t, M)  # stage 0's microbatch (= (t - S) mod M)

            # ---- stage 0: finish the arriving stream, start the next ----
            xf = rms_norm(x, params_l["final_norm"], cfg.rms_norm_eps)
            logits = compute_logits(params_l, xf[:, 0], use_pallas)
            if sampled:
                from qwen_inference_engine_tpu.ops.sampling import (
                    sample_rows,
                )

                sp_m = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, m0, 0, keepdims=False), sp_dyn)
                if penalized:
                    seen_m = jax.lax.dynamic_index_in_dim(
                        sn, m0, 0, keepdims=False)          # [b, V]
                    new_tok = sample_rows(
                        logits, jax.random.fold_in(rkey, t), k_cap=k_cap,
                        approx_top_k=approx_top_k, seen_mask=seen_m, **sp_m)
                    # mark only REAL emissions (warmup ticks sample
                    # garbage logits that never feed back)
                    upd = seen_m.at[jnp.arange(b), new_tok].set(True)
                    seen_m = jnp.where(t >= stages, upd, seen_m)
                    sn = jax.lax.dynamic_update_index_in_dim(
                        sn, seen_m, m0, 0)
                else:
                    new_tok = sample_rows(
                        logits, jax.random.fold_in(rkey, t), k_cap=k_cap,
                        approx_top_k=approx_top_k, seen_mask=None, **sp_m)
            else:
                new_tok = jnp.argmax(logits, -1).astype(jnp.int32)  # [b]
            tok = jnp.where(t < M,
                            jax.lax.dynamic_index_in_dim(
                                init_toks, m0, 0, keepdims=False),
                            new_tok)
            emitted = jnp.where(t >= stages, new_tok, -1)
            x0 = jnp.take(params_l["embed"], tok, axis=0)[:, None, :]
            x_in = jnp.where(sid == 0, x0, x)

            # ---- all stages: local layers; stage s is working on
            # microbatch (t - s) mod M at its step (t - s) // M (clamped:
            # warmup ticks write garbage at the step-0 position, which the
            # real step-0 pass overwrites before anything reads it) ----
            m_s = jnp.mod(t - sid, M)
            k_s = jnp.maximum((t - sid) // M, 0)
            p_m = jax.lax.dynamic_index_in_dim(
                init_pos.astype(jnp.int32), m_s, 0, keepdims=False) + k_s
            positions = jnp.broadcast_to(p_m, (b,))[:, None]
            row0 = m_s * b
            toks_m = jnp.zeros((b, 1), jnp.int32)  # unused (inputs_embeds)
            if zero_copy_cache:
                # full cache in, row window via scalar prefetch: the append
                # is an in-place tile RMW of rows [row0, row0+b), attention
                # reads those rows directly — no per-tick window copies
                hidden, lc = forward_hidden(
                    params_l, cfg_l, toks_m, positions, lc,
                    fresh_prefill=False, use_pallas=True, attn_impl="pallas",
                    uniform_decode=True, inputs_embeds=x_in,
                    apply_final_norm=False, cache_row0=row0)
            else:
                win = jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, row0, b, axis=1),
                    lc)
                hidden, win2 = forward_hidden(
                    params_l, cfg_l, toks_m, positions, win,
                    fresh_prefill=False, use_pallas=use_pallas,
                    uniform_decode=True, inputs_embeds=x_in,
                    apply_final_norm=False)
                lc = jax.tree.map(
                    lambda full, w: jax.lax.dynamic_update_slice_in_dim(
                        full, w, row0, axis=1), lc, win2)
            x = jax.lax.ppermute(hidden.astype(x.dtype), STAGE_AXIS, fwd)
            if penalized:
                return (x, lc, sn), emitted
            return (x, lc), emitted

        x0 = jnp.zeros((b, 1, D), params_l["embed"].dtype)
        carry0 = (x0, cache_l, seen0) if penalized else (x0, cache_l)
        carry, ys = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        cache_l = carry[1]
        # ys are only meaningful on stage 0: replicate them
        ys = jax.lax.psum(jnp.where(sid == 0, ys, 0), STAGE_AXIS)
        if penalized:
            # same replication for the mask (non-0 stages marked garbage
            # samples that never fed back)
            seen = jax.lax.psum(
                jnp.where(sid == 0, carry[2].astype(jnp.int8), 0),
                STAGE_AXIS) > 0
            return ys, cache_l, seen
        return ys, cache_l

    extra = (P(), P()) if sampled else ()
    if penalized:
        extra += (P(),)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, P(), P(), cspec) + extra,
        out_specs=(P(), cspec) + ((P(),) if penalized else ()),
        check_vma=False,
    )

    def wrapped(params_s, init_toks, init_pos, cache_s, *rest):
        out = fn(params_s, init_toks, init_pos, cache_s, *rest)
        ys, cache_s = out[0], out[1]
        # tick S + k·M + m completed token k of microbatch m
        idx = stages + jnp.arange(steps)[:, None] * M + jnp.arange(M)[None, :]
        if penalized:
            return ys[idx], cache_s, out[2]
        return ys[idx], cache_s

    return wrapped
