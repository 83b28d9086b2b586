"""Timing helpers that survive the axon tunnel.

- jax.block_until_ready can return early through this tunnel; only a value
  fetch (np.asarray) is a true sync.
- A scalar fetch costs ~30 ms RTT, so short measurements are poisoned by a
  constant. We run the op inside lax.scan at two lengths and report the
  marginal cost per iteration: (t_hi - t_lo) / (reps * (hi - lo)).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def marginal_us(op, weights, make_x, n_scan=24, reps_hi=12, reps_lo=3):
    """op(weights, x) per-call us.

    One compile (a lax.scan of n_scan distinct inputs); the constant fetch
    RTT (~30 ms on this tunnel) is cancelled by differencing two repetition
    counts of the same compiled fn: (t_hi - t_lo) / ((reps_hi-reps_lo)*n).
    """
    def body(acc, x):
        y = op(weights, x)
        leaves = jax.tree.leaves(y)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return acc + s, None

    @jax.jit
    def run(w, xs):
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs = make_x(n_scan)
    r = run(weights, xs)
    np.asarray(r)  # warm + compile

    def timed(reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = run(weights, xs)
        np.asarray(r)
        return time.perf_counter() - t0

    t_lo = timed(reps_lo)
    t_hi = timed(reps_hi)
    return (t_hi - t_lo) / ((reps_hi - reps_lo) * n_scan) * 1e6
