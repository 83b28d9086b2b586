"""Oracle tests for the EP all-to-all layout math (parallel/ep_layout).

The production ``ragged_all_to_all`` branch can only execute on real
multi-device hardware (CPU lacks the thunk), so the offsets/sizes math
around it is proven here directly: a numpy loop implements the
collective's documented semantics (for each destination d, sender s
copies ``payload[input_offs[d] : +send_sizes[d]]`` into d's buffer at
``output_offsets[d]``), and the full dispatch -> grouped compute ->
combine round-trip must reproduce a per-token oracle for skewed, empty,
full-capacity, and random routings (VERDICT r4 next-round #6)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen_inference_engine_tpu.parallel.ep_layout import (
    combine_gather_indices,
    dispatch_layout,
    receive_layout,
)


def _layouts(topi_per_dev, e_loc, P):
    return [tuple(np.asarray(a) for a in dispatch_layout(
        jnp.asarray(t), e_loc, P)) for t in topi_per_dev]


def _roundtrip(P, e_loc, top_k, topi_per_dev, h_per_dev):
    """Simulate the full EP exchange with numpy implementing the
    collective; expert e's compute is x * (global_e + 1) so misrouted or
    misplaced rows change the result. Returns per-device [N, D] outputs
    with pair weights 1 (layout only — router weighting is out of
    scope)."""
    N, D = h_per_dev[0].shape
    M = N * top_k
    lay = _layouts(topi_per_dev, e_loc, P)

    # --- dispatch: receiver buffers partitioned per source ---
    bufs = [np.zeros((P * M, D + 1)) for _ in range(P)]
    recv_sizes = np.zeros((P, P), np.int32)      # [receiver, source]
    for s in range(P):
        order, tok, eid_sorted, send_sizes, input_offs = lay[s]
        payload = np.concatenate(
            [h_per_dev[s][tok], (eid_sorted % e_loc)[:, None]], -1)
        for d in range(P):
            n = send_sizes[d]
            # sender s writes at the constant offset s*M on every peer
            bufs[d][s * M: s * M + n] = payload[input_offs[d]:
                                                input_offs[d] + n]
            recv_sizes[d, s] = n

    # --- receive-side grouping + compute + combine ---
    back = [np.zeros((M, D)) for _ in range(P)]
    for d in range(P):
        valid, eid_rx, order2, gs = (np.asarray(a) for a in receive_layout(
            jnp.asarray(bufs[d][:, D]), jnp.asarray(recv_sizes[d]), M,
            e_loc))
        assert gs.sum() == valid.sum() == recv_sizes[d].sum()
        xs2 = bufs[d][:, :D][order2]
        y2 = np.zeros_like(xs2)
        start = 0
        for e in range(e_loc):
            y2[start: start + gs[e]] = (xs2[start: start + gs[e]]
                                        * (d * e_loc + e + 1))
            start += gs[e]
        # rows past the valid count must be grouped last (id e_loc)
        assert (np.asarray(eid_rx)[order2][valid.sum():] == e_loc).all()
        y_rx = np.zeros((P * M, D))
        y_rx[order2] = y2
        # combine: segment from source s returns to s's dispatch offset
        for s in range(P):
            n = recv_sizes[d, s]
            off = lay[s][4][d]                   # s's input_offs for peer d
            back[s][off: off + n] = y_rx[s * M: s * M + n]

    # --- scatter-add back to token order (weights 1) ---
    outs = []
    for s in range(P):
        order, tok, eid_sorted, send_sizes, input_offs = lay[s]
        out = np.zeros((N, D))
        np.add.at(out, tok, back[s])
        outs.append(out)
    return outs


def _oracle(topi, h):
    """Per-token expected output: sum over the token's chosen experts of
    h * (global_expert_id + 1)."""
    return (h[:, None, :] * (topi[..., None] + 1.0)).sum(1)


def _check(P, e_loc, top_k, topi_per_dev, seed=0):
    rng = np.random.default_rng(seed)
    N = topi_per_dev[0].shape[0]
    D = 5
    h = [rng.normal(size=(N, D)) for _ in range(P)]
    outs = _roundtrip(P, e_loc, top_k, topi_per_dev, h)
    for s in range(P):
        np.testing.assert_allclose(outs[s], _oracle(topi_per_dev[s], h[s]),
                                   rtol=1e-12, err_msg=f"device {s}")


def test_random_routing_e_loc1():
    rng = np.random.default_rng(1)
    P, e_loc, top_k, N = 4, 1, 2, 6
    topi = [np.stack([rng.choice(P * e_loc, top_k, replace=False)
                      for _ in range(N)]) for _ in range(P)]
    _check(P, e_loc, top_k, topi)


def test_random_routing_grouped_experts():
    rng = np.random.default_rng(2)
    P, e_loc, top_k, N = 4, 2, 3, 5
    topi = [np.stack([rng.choice(P * e_loc, top_k, replace=False)
                      for _ in range(N)]) for _ in range(P)]
    _check(P, e_loc, top_k, topi)


def test_skewed_all_to_one_expert_full_capacity():
    """Every pair on every device routes to expert 0: device 0 receives
    P*M rows (its buffer exactly full), everyone else receives zero."""
    P, e_loc, top_k, N = 4, 2, 2, 4
    topi = [np.zeros((N, top_k), np.int64) for _ in range(P)]
    _check(P, e_loc, top_k, topi)
    lay = _layouts(topi, e_loc, P)
    for s in range(P):
        assert lay[s][3].tolist() == [N * top_k, 0, 0, 0]


def test_empty_lanes_between_some_peers():
    """Devices route only to their own parity class — half the (s, d)
    lanes carry zero rows."""
    P, e_loc, top_k, N = 4, 1, 2, 6
    rng = np.random.default_rng(3)
    topi = []
    for s in range(P):
        allowed = [e for e in range(P) if e % 2 == s % 2]
        topi.append(np.stack([rng.choice(allowed, top_k, replace=False)
                              for _ in range(N)]))
    _check(P, e_loc, top_k, topi)


def test_single_device_degenerate():
    """P=1: the exchange is a local permutation (what the real-chip probe
    exercised); the layout math must still group and restore exactly."""
    rng = np.random.default_rng(4)
    P, e_loc, top_k, N = 1, 4, 2, 7
    topi = [np.stack([rng.choice(e_loc, top_k, replace=False)
                      for _ in range(N)])]
    _check(P, e_loc, top_k, topi)


def test_dispatch_layout_properties():
    """Direct invariants: destination segments contiguous and ordered,
    sizes conserved, stable order (equal experts keep pair order)."""
    rng = np.random.default_rng(5)
    P, e_loc, top_k, N = 4, 2, 2, 16
    topi = np.stack([rng.choice(P * e_loc, top_k, replace=False)
                     for _ in range(N)])
    order, tok, eid_sorted, send_sizes, input_offs = (
        np.asarray(a) for a in dispatch_layout(jnp.asarray(topi), e_loc, P))
    M = N * top_k
    assert send_sizes.sum() == M
    assert (np.diff(eid_sorted) >= 0).all()
    assert input_offs.tolist() == np.concatenate(
        [[0], np.cumsum(send_sizes)[:-1]]).tolist()
    for d in range(P):
        seg = eid_sorted[input_offs[d]: input_offs[d] + send_sizes[d]]
        assert ((seg // e_loc) == d).all()
    # stability: pairs with equal expert id stay in flat order
    flat = topi.reshape(-1)
    for e in np.unique(flat):
        np.testing.assert_array_equal(order[eid_sorted == e],
                                      np.nonzero(flat == e)[0])


def test_combine_gather_matches_ragged_placement():
    """The dense-fallback gather indices must place every row exactly
    where the ragged combine's output offsets (sender input_offs) put
    it — the two paths' layouts are the same contract."""
    rng = np.random.default_rng(6)
    P, e_loc, top_k, N = 4, 2, 2, 6
    M = N * top_k
    topi = np.stack([rng.choice(P * e_loc, top_k, replace=False)
                     for _ in range(N)])
    order, tok, eid_sorted, send_sizes, input_offs = (
        np.asarray(a) for a in dispatch_layout(jnp.asarray(topi), e_loc, P))
    idx = np.asarray(combine_gather_indices(
        jnp.asarray(eid_sorted), jnp.asarray(input_offs), M, e_loc))
    # simulate: peer d returns my segment at back rows [d*M, d*M+n)
    back_rows = np.full((P * M,), -1, np.int64)
    for d in range(P):
        n = send_sizes[d]
        back_rows[d * M: d * M + n] = np.arange(input_offs[d],
                                                input_offs[d] + n)
    # gathering with idx must yield my dispatch-sorted row order 0..M-1
    np.testing.assert_array_equal(back_rows[idx], np.arange(M))
