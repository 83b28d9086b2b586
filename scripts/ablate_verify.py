"""Measure the speculative verify forward vs the plain decode tick (7B,
paged cache) — the M-fill structural measurement of VERDICT r2 #1.

For each spec_k: time ONE verify forward (T=k+1 tokens per slot) against
one plain decode tick at the same batch, both through the scheduler's own
jits on the real chip. Reports ms/forward, the implied tok/s at full
acceptance, and the ceil(M/128)-pass-model prediction for the matmul
chain so the measurement can be checked against the v5e cost model
(docs/PERF.md).

Timing follows scripts/tpu_timing.py's rules: value-fetch sync only,
chained calls, differenced repetition counts.

Usage: python scripts/ablate_verify.py [model] [batch] [ctx]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig, tiny_config
from qwen_inference_engine_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.models.qwen import init_quantized_params
from qwen_inference_engine_tpu.ops.sampling import SamplingParams


def log(*a):
    print(*a, flush=True)


def timed(fn_call, reps_a=4, reps_b=12):
    """Marginal seconds/call via differenced repetition counts."""
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_call()
        np.asarray(jax.tree.leaves(out)[0])[:1]  # value-fetch sync
        return time.perf_counter() - t0

    run(2)  # warm
    ta = min(run(reps_a) for _ in range(2))
    tb = min(run(reps_b) for _ in range(2))
    return (tb - ta) / (reps_b - reps_a)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-7b"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 1408
    cfg = tiny_config() if model == "tiny" else ModelConfig.from_pretrained(model)
    log(f"ablate_verify: {cfg.name} b{batch} ctx{ctx} on "
        f"{jax.devices()[0].device_kind}")

    # CPU sanity runs need f32 (XLA:CPU has no bf16 DotThunk)
    dt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                   group_size=256, quantize_lm_head=True,
                                   pad_free=True, dtype=dt)
    jax.block_until_ready(params)

    page = 512  # serving default (per-page DMA issue cost; PERF.md r4)
    # earlier-admitted slots DECODE one token per tick while later slots
    # prefill (continuous batching!): budget max_new past the admission
    # phase (~batch ticks at whole-prompt chunks) so no slot finishes by
    # length and frees itself before the measurement starts
    max_new = batch + 80
    pages_per_seq = -(-(ctx + max_new + 8) // page)
    cb = ContinuousBatchingEngine(
        cfg, params, max_slots=batch, page_size=page,
        num_pages=batch * pages_per_seq + 8, max_pages_per_seq=pages_per_seq,
        sampling=SamplingParams(greedy=True),
        kv_dtype=jnp.int8 if jax.default_backend() == "tpu" else jnp.float32,
        prefix_cache=False, speculative=True, spec_k=4,
        prefill_chunk=ctx)  # one tick per admission
    # random weights can argmax onto EOS for some prompt, finishing a slot
    # mid-prefill and breaking the fixed-batch measurement: disable stops
    cb._eos = set()
    # plain ticks during admission (spec rounds would emit up to k+1
    # tokens per tick and blow the per-slot page budget); re-enabled for
    # the measured fns below
    cb.speculative = False
    rng = np.random.default_rng(0)
    for rid in range(batch):
        cb.submit(Request(
            request_id=rid,
            prompt=rng.integers(0, cfg.vocab_size, ctx).tolist(),
            max_new_tokens=max_new))
    t0 = time.perf_counter()
    while cb._pending or any(s is not None and not s.prefill_done
                             for s in cb._slots):
        cb.step()
    assert all(s is not None for s in cb._slots), "requests were rejected"
    cb.speculative = True
    log(f"prefill+admit: {time.perf_counter() - t0:.1f}s")

    # state snapshots for repeatable calls
    toks = np.zeros((batch,), np.int32)
    pos = np.zeros((batch,), np.int32)
    tables = np.array(cb._block_tables)
    for s in cb._slots:
        toks[s.slot] = s.last_token
        pos[s.slot] = s.seq_len
    toks_d, pos_d = jnp.asarray(toks), jnp.asarray(pos)
    tables_d = jnp.asarray(tables)
    sp_rows = cb._sp_dyn_rows()
    rkey = jax.random.PRNGKey(7)
    active_d = cb._active_mask([s for s in cb._slots if s is not None])

    dec = cb._jit_decode()

    def plain():
        nonlocal_state["nxt"], cb.cache, cb._seen = dec(
            cb.params, toks_d, pos_d, cb.cache, tables_d, rkey, sp_rows,
            cb._seen, active_d)
        return nonlocal_state["nxt"]

    # QIE_ABLATE_SMOKE=1: CPU CI signature check — one k, minimal reps
    smoke = os.environ.get("QIE_ABLATE_SMOKE") == "1"
    reps = dict(reps_a=1, reps_b=2) if smoke else {}
    ks = (2,) if smoke else (2, 3, 4, 6)

    nonlocal_state = {}
    t_plain = timed(plain, **reps)
    log(f"plain decode tick: {t_plain*1e3:.2f} ms -> "
        f"{batch/t_plain:.0f} tok/s")

    for k in ks:
        cb.spec_k = k
        ver = cb._jit_verify()
        toks_k = jnp.concatenate(
            [toks_d[:, None],
             jnp.zeros((batch, k), jnp.int32)], axis=1)
        drafts = jnp.zeros((batch, k), jnp.int32)

        def verify():
            chain, n_new, cb.cache, cb._seen = ver(
                cb.params, toks_k, pos_d, cb.cache, tables_d, rkey,
                sp_rows, cb._seen, drafts, active_d)
            return chain

        t_ver = timed(verify, **reps)
        m = batch * (k + 1)
        passes = -(-m // 128) / -(-batch // 128)
        log(f"k={k}: verify {t_ver*1e3:.2f} ms "
            f"({t_ver/t_plain:.2f}x plain; matmul pass model {passes:.0f}x); "
            f"full-accept {batch*(k+1)/t_ver:.0f} tok/s "
            f"({(k+1)*t_plain/t_ver:.2f}x); "
            f"break-even accept {t_ver/t_plain:.2f} tok/forward")


if __name__ == "__main__":
    main()
