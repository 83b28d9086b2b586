"""Run the five BASELINE.json configs (as far as this host allows).

1. Qwen2-0.5B FP16(f32 on CPU runtime), batch-1 greedy, 128-token prompt
2. Qwen2-1.5B INT8 weights + INT8 KV, batch-1 decode, single chip
3. Qwen2.5-7B INT4, batched decode over the PAGED cache (batch 8-32)
4. Qwen2.5-7B INT4 continuous batching + 32k sharded KV  -> virtual-mesh
   dryrun (__graft_entry__.dryrun_multichip); no multi-chip hardware
5. Qwen2.5-32B INT4 2-host                               -> blocked: no hw
   (tests/test_multihost.py + parallel/tp_step.py are the program)

Usage: python scripts/run_configs.py [1|2|3]   (default: all runnable)
Random weights (no checkpoints on this host); arithmetic identical.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.engine.engine import Engine
from qwen_inference_engine_tpu.engine.scheduler import (
    ContinuousBatchingEngine,
    Request,
)
from qwen_inference_engine_tpu.models.qwen import (
    init_params,
    init_quantized_params,
)
from qwen_inference_engine_tpu.ops.sampling import SamplingParams


def config1():
    cfg = ModelConfig.from_pretrained("qwen2-0.5b")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    eng = Engine(cfg, params, max_batch=1, max_seq=512,
                 sampling=SamplingParams(greedy=True))
    prompt = list(np.random.default_rng(0).integers(1, cfg.vocab_size, 128))
    t0 = time.perf_counter()
    res = eng.generate([prompt], max_new_tokens=32)
    print(f"[config 1] qwen2-0.5b bf16 b1 greedy 128-tok prompt: "
          f"{len(res.token_ids[0])} tokens, ttft {res.ttft_s:.2f}s, "
          f"{res.decode_tokens_per_s:.1f} tok/s "
          f"(total {time.perf_counter()-t0:.1f}s incl compile)", flush=True)


def config2():
    cfg = ModelConfig.from_pretrained("qwen2-1.5b")
    params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=8,
                                   group_size=128)
    eng = Engine(cfg, params, max_batch=1, max_seq=512,
                 kv_dtype=jnp.int8,
                 sampling=SamplingParams(temperature=0.7, top_k=50))
    prompt = list(np.random.default_rng(0).integers(1, cfg.vocab_size, 128))
    t0 = time.perf_counter()
    res = eng.generate([prompt], max_new_tokens=64)
    print(f"[config 2] qwen2-1.5b INT8 weights + INT8 KV, b1: "
          f"{len(res.token_ids[0])} tokens, {res.decode_tokens_per_s:.1f} "
          f"tok/s (total {time.perf_counter()-t0:.1f}s incl compile)",
          flush=True)


def config3():
    cfg = ModelConfig.from_pretrained("qwen2.5-7b")
    params = init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                   group_size=256, quantize_lm_head=True,
                                   pad_free=True)
    jax.block_until_ready(params)
    cb = ContinuousBatchingEngine(
        cfg, params, max_slots=16, page_size=16, num_pages=1024,
        max_pages_per_seq=48,
        sampling=SamplingParams(temperature=0.7, top_k=50), seed=0)
    rng = np.random.default_rng(0)
    # warm the jit caches so the timed phase measures steady-state serving
    cb.submit(Request(request_id=999, max_new_tokens=10,
                      prompt=rng.integers(1, cfg.vocab_size, 256).tolist()))
    cb.run_to_completion()
    from qwen_inference_engine_tpu.utils.metrics import Metrics

    cb.metrics = Metrics()
    t0 = time.perf_counter()
    for i in range(16):
        cb.submit(Request(request_id=i,
                          prompt=rng.integers(1, cfg.vocab_size, 256).tolist(),
                          max_new_tokens=48))
    done = cb.run_to_completion()
    dt = time.perf_counter() - t0
    toks = sum(len(f.token_ids) for f in done)
    print(f"[config 3] qwen2.5-7b INT4 paged batch-16 (warm): {len(done)} "
          f"requests, {toks} tokens in {dt:.1f}s; engine metrics "
          f"{cb.metrics.snapshot()}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3"]
    for w in which:
        {"1": config1, "2": config2, "3": config3}[w]()
    print("[config 4] virtual-mesh dryrun: see __graft_entry__."
          "dryrun_multichip (32k paged KV sharded over the model axis)")
    print("[config 5] blocked: no 2-host hardware; program = "
          "parallel/tp_step.py + tests/test_multihost.py")
