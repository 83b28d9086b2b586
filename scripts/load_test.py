"""Mixed prefill+decode load test for the continuous-batching engine.

Staggered request arrivals against a live ContinuousBatchingEngine;
reports p50/p99 TTFT, inter-token latency percentiles measured DURING
admissions (the head-of-line metric — chunked prefill must keep running
decodes from stalling for a whole prompt), and aggregate decode tok/s.
The BASELINE.md "also tracked" serving metric.

Usage: python scripts/load_test.py [model] [n_requests] [prompt_len]
       [step_ticks] [mode]

mode: plain (default) | spec (prompt-lookup, device-chained) |
      spec-self (draft model == target: the full-acceptance ceiling of
      the chained drafter+verify round under mixed load)

step_ticks > 1 drives the serving loop through engine.step_batch (the
HTTP server's default: decode ticks chained on device, one host sync per
batch) — the inter-token stats then show the burst pattern: in-batch
gaps near zero, one sync-sized gap per batch, and a lower mean.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig, tiny_config
from qwen_inference_engine_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.models.qwen import (
    init_params,
    init_quantized_params,
)
from qwen_inference_engine_tpu.ops.sampling import SamplingParams


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2-0.5b"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    plen = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    step_ticks = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
    greedy = len(sys.argv) > 6 and sys.argv[6] == "greedy"
    max_new = 48

    if model == "tiny":
        cfg = tiny_config(num_heads=4, num_kv_heads=2, head_dim=128,
                          hidden_size=256)
        dt = (jnp.float32 if jax.default_backend() == "cpu"
              else jnp.bfloat16)  # XLA:CPU has no bf16 DotThunk
        params = init_params(cfg, jax.random.PRNGKey(0), dt)
    else:
        cfg = ModelConfig.from_pretrained(model)
        params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                       group_size=256, quantize_lm_head=True,
                                       pad_free=True)
    jax.block_until_ready(params)

    page = 512  # serving default (per-page DMA issue cost; PERF.md r4)
    pages_per_seq = -(-(plen + max_new + 8) // page) + 1
    eng = ContinuousBatchingEngine(
        cfg, params, max_slots=8, page_size=page,
        kv_dtype=(jnp.float32 if jax.default_backend() == "cpu"
                  else jnp.bfloat16),
        num_pages=8 * pages_per_seq + 8,
        max_pages_per_seq=pages_per_seq,
        sampling=SamplingParams(temperature=0.7, top_k=50, greedy=greedy,
                                approx_top_k=jax.default_backend() == "tpu"),
        seed=0,
        speculative=mode.startswith("spec"), spec_k=4,
        draft_params=params if mode == "spec-self" else None,
        draft_cfg=cfg if mode == "spec-self" else None)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=plen).tolist()
               for _ in range(n_req)]

    # warm the compile caches with one full request; speculative modes
    # additionally need the verify/chained shapes compiled (a PERIODIC
    # prompt guarantees the spec rounds actually run in warmup — without
    # it the first verify compile lands inside the measurement window)
    eng.submit(Request(request_id=10_000, prompt=prompts[0][:plen],
                       max_new_tokens=4))
    eng.run_to_completion()
    if mode.startswith("spec"):
        period = rng.integers(1, cfg.vocab_size, 24).tolist()
        eng.submit(Request(request_id=10_001,
                           prompt=(period * (plen // 24))[:plen],
                           max_new_tokens=32))
        eng.run_to_completion()
    print("warmup done", flush=True)

    token_times: dict = {}
    eng.on_token = lambda rid, tok: token_times.setdefault(rid, []).append(
        time.perf_counter())

    submit_t: dict = {}
    t0 = time.perf_counter()
    next_i = 0
    tick_gaps = []
    last_tick = None
    admit_ticks = 0
    while next_i < n_req or eng.has_work():
        # staggered arrivals: 2 new requests every 4 ticks. The idle
        # guard matters: a drained engine stops advancing _step_count,
        # and if it parked on a non-multiple the gate would never fire
        # again (the r4 "load test hang" was this script, not the engine)
        if next_i < n_req and (next_i < 2 or eng._step_count % 4 == 0
                               or not eng.has_work()):
            for _ in range(2):
                if next_i >= n_req:
                    break
                submit_t[next_i] = time.perf_counter()
                eng.submit(Request(request_id=next_i, prompt=prompts[next_i],
                                   max_new_tokens=max_new))
                next_i += 1
        had_prefill = any(s is not None and not s.prefill_done
                          for s in eng._slots) or eng.num_pending
        now = time.perf_counter()
        if last_tick is not None and eng.num_active:
            tick_gaps.append((now - last_tick, bool(had_prefill)))
        last_tick = now
        if step_ticks > 1:
            eng.step_batch(step_ticks)
        else:
            eng.step()
        if had_prefill:
            admit_ticks += 1
    wall = time.perf_counter() - t0

    ttfts = sorted(token_times[i][0] - submit_t[i] for i in range(n_req))
    itls = []
    itls_during_admission = []
    for gap, during in tick_gaps:
        itls.append(gap)
        if during:
            itls_during_admission.append(gap)
    total_toks = sum(len(v) for k, v in token_times.items() if k < n_req)

    def pct(xs, q):
        xs = sorted(xs)
        return xs[min(int(q * len(xs)), len(xs) - 1)] if xs else 0.0

    print(f"model={cfg.name} requests={n_req} prompt={plen} "
          f"max_new={max_new} slots=8 mode={mode}")
    print(f"TTFT p50={pct(ttfts, 0.5)*1e3:.0f} ms  "
          f"p99={pct(ttfts, 0.99)*1e3:.0f} ms")
    print(f"inter-tick p50={pct(itls, 0.5)*1e3:.1f} ms  "
          f"p99={pct(itls, 0.99)*1e3:.1f} ms")
    print(f"inter-tick DURING admissions p50="
          f"{pct(itls_during_admission, 0.5)*1e3:.1f} ms  "
          f"p99={pct(itls_during_admission, 0.99)*1e3:.1f} ms "
          f"({admit_ticks} admission ticks)")
    # true inter-token latency per request (token-timestamp gaps): under
    # step_batch most gaps are ~0 (burst) with one host-sync gap per batch
    tok_gaps = []
    for rid, ts in token_times.items():
        if rid < n_req:
            tok_gaps += [b - a for a, b in zip(ts, ts[1:])]
    print(f"inter-TOKEN p50={pct(tok_gaps, 0.5)*1e3:.1f} ms  "
          f"p99={pct(tok_gaps, 0.99)*1e3:.1f} ms  "
          f"mean={1e3*sum(tok_gaps)/max(len(tok_gaps),1):.1f} ms "
          f"(step_ticks={step_ticks})")
    print(f"decode throughput: {total_toks/wall:.1f} tok/s over {wall:.1f} s")
    snap = eng.metrics.snapshot()
    print(f"engine metrics: {snap}")


if __name__ == "__main__":
    main()
