"""Warm-request latency with prefix caching at 512-token serving pages.

Re-runs the round-2 experiment (280 ms cold -> 152 ms warm at page 16,
docs/PERF.md round-2 coda) at the page-512 serving default, where
whole-page granularity alone would forfeit up to 511 trailing tokens of a
shared prompt. Round 5 added sub-page tail registration + partial-page
copy reuse (engine/prefix_cache.py): a 1408-token shared prompt is 2 full
pages (1024 tokens) + a 383-token reusable band, so the warm request
prefills ONE token instead of 384.

Run on the real chip: Qwen2.5-7B INT4, single slot, 1408-token prompt,
4 new tokens.
  cold  = first request (full chunked prefill, compile amortized first)
  warm0 = same prompt, prefix cache OFF   (the re-prefill baseline)
  warm1 = same prompt, prefix cache ON    (2 full pages + sub-page band)
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.models.qwen import init_quantized_params
from qwen_inference_engine_tpu.ops.sampling import SamplingParams


def run(prefix_cache: bool, params, cfg, prompt, reps=3):
    eng = ContinuousBatchingEngine(
        cfg, params, max_slots=1, page_size=512, num_pages=24,
        max_pages_per_seq=8, prefix_cache=prefix_cache,
        sampling=SamplingParams(greedy=True), prefill_chunk=256)
    outs = []

    def request(rid):
        eng.submit(Request(rid, list(prompt), max_new_tokens=4))
        t0 = time.perf_counter()
        done = []
        while eng.has_work():
            done += eng.step()
        dt = time.perf_counter() - t0
        return dt, done[0].token_ids

    dt0, toks0 = request(0)          # compile + cold
    print(f"  prefix_cache={prefix_cache}: first (compile) {dt0:.2f}s",
          flush=True)
    for r in range(reps):
        dt, toks = request(1 + r)
        assert toks == toks0, (toks, toks0)
        outs.append(dt)
    lab = "warm-cached" if prefix_cache else "warm-uncached"
    print(f"  {lab}: {', '.join(f'{d*1e3:.0f}' for d in outs)} ms "
          f"(prefix hits: {eng.metrics.snapshot().get('prefix_hit_tokens', 0)}"
          " tokens)", flush=True)
    return min(outs)


def main():
    cfg = ModelConfig.from_pretrained("qwen2.5-7b")
    params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                   group_size=256, quantize_lm_head=True,
                                   pad_free=True)
    jax.block_until_ready(params)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, 1408).astype(np.int32).tolist()
    t_un = run(False, params, cfg, prompt)
    t_ca = run(True, params, cfg, prompt)
    print(f"RESULT page512 warm-uncached {t_un*1e3:.0f} ms -> "
          f"warm-cached {t_ca*1e3:.0f} ms ({t_un/t_ca:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
