"""Expert-parallel MoE with all-to-all token routing (shard_map).

The GSPMD path (parallel/sharding.py) shards the expert stacks over the
model axis and lets XLA pick the collectives for ``ragged_dot`` — correct,
but the routing traffic is compiler-chosen. This module is the explicit
EP program (ROADMAP #7 / VERDICT r2 #9): tokens are data-sharded, experts
are device-sharded, and each token pair crosses the ICI exactly twice via
``jax.lax.ragged_all_to_all`` — the TPU analogue of the dispatch/combine
all-to-alls in every production MoE stack, and the program whose traffic
per step is ``2 * N_local * top_k * D`` bytes regardless of expert count.

Layout inside ``shard_map`` (axis ``ep`` of size P, E % P == 0):
  * ``h_local [N_loc, D]``          — this device's tokens
  * ``w_gate/up/down [E/P, K, N]``  — this device's experts (bf16 stacks
    or quantized stacks; the grouped dequant kernel works per shard
    because experts are whole — no group-boundary concerns)
  * router weight replicated (tiny, accuracy-critical)

Algorithm (one dispatch + one combine all-to-all per layer):
  1. route: top-k over the full router; sort local (token, expert) pairs
     by global expert id → per-destination segments are contiguous.
  2. dispatch: ``ragged_all_to_all`` the sorted rows (+ a local-expert id
     column riding in the payload); each receiver's buffer is partitioned
     per source (capacity ``N_loc*top_k`` rows each), so senders know
     their write offsets without extra negotiation. Counts/offsets ride a
     tiny ``all_gather`` ([P] ints per device).
  3. compute: re-sort received rows by LOCAL expert (stable argsort over
     the id column), one grouped gate/up/silu/mul/down chain
     (``ragged_dot`` or the Pallas grouped dequant kernel), un-sort.
  4. combine: the mirror ``ragged_all_to_all`` returns each row to its
     source position; weighted scatter-add back to [N_loc, D].

Exactness: no capacity factor, no token dropping — the receive buffers
are sized for the worst case (every pair to one peer), so routing is
bitwise-identical to the single-device ``moe_mlp`` grouping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expert_compute(xs, w_gate, w_up, w_down, group_sizes, use_quant_kernel,
                    layer=None, act_bits=0):
    """Grouped gate/up/silu/mul/down over expert-sorted rows (local shard:
    [E_loc, K, N] bf16 arrays / quantized stacks, or layer-stacked
    [L, E_loc, K, N] with ``layer`` a traced index)."""
    stacked = layer is not None
    if use_quant_kernel:
        from qwen_inference_engine_tpu.ops.grouped_matmul import (
            grouped_quant_matmul,
            grouped_quant_matmul_supported,
        )

        if (grouped_quant_matmul_supported(w_gate, xs.shape[0])
                and grouped_quant_matmul_supported(w_down, xs.shape[0])):
            lidx = layer if stacked else None
            g = grouped_quant_matmul(xs, w_gate, group_sizes, lidx,
                                     act_bits=act_bits)
            u = grouped_quant_matmul(xs, w_up, group_sizes, lidx,
                                     act_bits=act_bits)
            mid = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
            return grouped_quant_matmul(mid.astype(xs.dtype), w_down,
                                        group_sizes, lidx,
                                        act_bits=act_bits)
        # unsupported tiling: dequantize the local shard and fall back
        # (mirrors models.qwen._expert_matmul)
        import dataclasses as _dc

        from qwen_inference_engine_tpu.ops.linear import dequantize

        def _dq(w, width):
            if stacked:
                w = _dc.replace(w, q=w.q[layer], scales=w.scales[layer],
                                b=None)
            wl = dequantize(_dc.replace(w, b=None))
            return wl[:, :width, :]

        g = jax.lax.ragged_dot(xs, _dq(w_gate, xs.shape[-1]).astype(xs.dtype),
                               group_sizes)
        u = jax.lax.ragged_dot(xs, _dq(w_up, xs.shape[-1]).astype(xs.dtype),
                               group_sizes)
        mid = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        wd = _dq(w_down, mid.shape[-1])
        return jax.lax.ragged_dot(mid.astype(xs.dtype), wd.astype(xs.dtype),
                                  group_sizes)
    if stacked:
        w_gate, w_up, w_down = w_gate[layer], w_up[layer], w_down[layer]
    g = jax.lax.ragged_dot(xs, w_gate.astype(xs.dtype), group_sizes)
    u = jax.lax.ragged_dot(xs, w_up.astype(xs.dtype), group_sizes)
    mid = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
    return jax.lax.ragged_dot(mid.astype(xs.dtype),
                              w_down.astype(xs.dtype), group_sizes)


def ep_moe_layer(h: jax.Array, router_w: jax.Array, w_gate, w_up, w_down,
                 top_k: int, norm_topk: bool, axis: str,
                 use_quant_kernel: bool = False,
                 ragged: bool | None = None, layer=None,
                 act_bits: int = 0) -> jax.Array:
    """One expert-parallel MoE layer; call INSIDE jax.shard_map.

    h [N_loc, D] local tokens; router_w [D, E] replicated; w_gate/up
    [E_loc, D, Fm] and w_down [E_loc, Fm, D] local expert shards (bf16
    arrays, or QuantLinear expert stacks when use_quant_kernel);
    layer-STACKED weights ([L, E_loc, ...]) with ``layer`` a traced index
    are supported for use inside a layer scan (forward_hidden's EP path).
    Returns [N_loc, D].

    ragged: use ``ragged_all_to_all`` (exact-size transfers; TPU) vs the
    dense capacity-padded ``all_to_all`` (XLA:CPU has no ragged thunk, so
    the virtual-mesh validation path pads to worst case — identical
    buffer layout, identical results, P× padded traffic). Default: ragged
    on TPU.
    """
    if ragged is None:
        ragged = jax.default_backend() == "tpu"
    P = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    N, D = h.shape
    E = router_w.shape[-1]
    edim = 1 if layer is not None else 0
    e_loc = (w_gate.q.shape[edim] if use_quant_kernel
             else w_gate.shape[edim])
    assert e_loc * P == E, (e_loc, P, E)

    # --- 1. route (full router view; same math as models.qwen.moe_mlp) ---
    logits = jnp.dot(h, router_w.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)            # [N, k]
    if norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)

    M = N * top_k                                        # pairs (= capacity)
    # layout math lives in ep_layout (pure, oracle-tested on CPU against
    # a numpy simulation of the collective's semantics)
    from qwen_inference_engine_tpu.parallel.ep_layout import (
        combine_gather_indices,
        dispatch_layout,
        receive_layout,
    )

    order, tok, eid_sorted, send_sizes, input_offs = dispatch_layout(
        topi, e_loc, P)
    xs = jnp.take(h, tok, axis=0)                        # [M, D] sorted

    # tiny metadata exchange: every device's (send_sizes, input_offs)
    meta = jnp.stack([send_sizes, input_offs], 0)        # [2, P]
    metag = jax.lax.all_gather(meta, axis)               # [P, 2, P]
    recv_sizes = metag[:, 0, :][:, me]                   # what each src sends me
    peer_offs = metag[:, 1, :][:, me]                    # src's offset of my slice

    # --- 2. dispatch a2a: payload = rows ++ local-expert-id column ---
    # the id column rides in the activation dtype; its integer range must
    # be exactly representable (bf16: 256, f16: 2048, f32: 2^24)
    id_cap = {jnp.bfloat16: 256, jnp.float16: 2048}.get(
        jnp.dtype(h.dtype).type, 1 << 24)
    assert e_loc <= id_cap, (
        f"{e_loc} local experts exceed the exactly-representable id range "
        f"of the {jnp.dtype(h.dtype).name} payload column ({id_cap})")
    eid_local_col = (eid_sorted % e_loc).astype(h.dtype)[:, None]
    payload = jnp.concatenate([xs, eid_local_col], -1)   # [M, D+1]
    if ragged:
        out_buf = jnp.zeros((P * M, D + 1), h.dtype)
        # receiver partitions its buffer per source: src s owns rows
        # [s*M, ..), so every sender writes at the same offset me*M on
        # every peer — no offset negotiation for the dispatch direction
        output_offs = jnp.full((P,), me * M, jnp.int32)
        recv = jax.lax.ragged_all_to_all(
            payload, out_buf, input_offs, send_sizes, output_offs,
            recv_sizes, axis_name=axis)
    else:
        # dense fallback: pad each destination segment to capacity M; the
        # received layout (src s at rows [s*M, ..)) matches the ragged path
        pi = jnp.arange(P * M, dtype=jnp.int32)
        dst, i = pi // M, pi % M
        src_idx = input_offs[dst] + i
        ok = i < send_sizes[dst]
        buf = jnp.where(ok[:, None],
                        jnp.take(payload, jnp.minimum(src_idx, M - 1), axis=0),
                        0)
        recv = jax.lax.all_to_all(buf.reshape(P, M, D + 1), axis, 0, 0,
                                  tiled=False).reshape(P * M, D + 1)

    # --- 3. compute on received tokens (sorted by local expert) ---
    valid, eid_rx, order2, gs2 = receive_layout(
        recv[:, D], recv_sizes, M, e_loc)
    xs2 = jnp.take(recv[:, :D], order2, axis=0)
    y2 = _expert_compute(xs2, w_gate, w_up, w_down, gs2, use_quant_kernel,
                         layer=layer, act_bits=act_bits)
    y_rx = jnp.zeros((P * M, D), y2.dtype).at[order2].set(y2)

    # --- 4. combine a2a (mirror of dispatch) ---
    if ragged:
        back_buf = jnp.zeros((M, D), y2.dtype)
        y_sorted = jax.lax.ragged_all_to_all(
            y_rx, back_buf,
            jnp.arange(P, dtype=jnp.int32) * M,          # src-partitioned
            recv_sizes, peer_offs, send_sizes, axis_name=axis)
    else:
        back = jax.lax.all_to_all(y_rx.reshape(P, M, D), axis, 0, 0,
                                  tiled=False).reshape(P * M, D)
        # back rows [p*M + i] = row i of my dispatch segment to peer p
        y_sorted = jnp.take(
            back, combine_gather_indices(eid_sorted, input_offs, M, e_loc),
            axis=0)

    w = jnp.take(topw.reshape(-1), order)[:, None].astype(y_sorted.dtype)
    out = jnp.zeros((N, D), y_sorted.dtype).at[tok].add(y_sorted * w)
    return out.astype(h.dtype)

