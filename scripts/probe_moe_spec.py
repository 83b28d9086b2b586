"""Probe: speculation's verify M-fill on the MoE grouped path.

docs/PERF.md round-5 documents the MoE bound: at decode every touched
expert pays a full M-tile of MXU passes for ~B*k/E ~ 2 tokens, so the
grouped matmuls run at ~1/8 pass utilization.  The documented lever with
measured precedent (the dense verify's M-fill) is MORE TOKENS PER
EXPERT.  Speculation's verify forward runs M = B*(k+1) tokens through
the router, multiplying tokens/expert by k+1 at a near-flat pass count —
exactly like the b32->b128 batch-scaling coda (17.05 -> 20.63 ms/step
for 4x the tokens).

This probe runs the full continuous-batching scheduler (PLD speculation,
paged pool) on the Qwen3-30B-A3B per-layer shape and reports spec vs
plain serving tok/s — the MoE analogue of bench.py's dense spec rows.

Usage:
  python scripts/probe_moe_spec.py --tiny          # CPU sanity (greedy parity)
  python scripts/probe_moe_spec.py                 # chip, 12-layer 30B-A3B shape
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU-sized MoE config")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=96)
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax  # noqa: E402
    from qwen_inference_engine_tpu.config import (  # noqa: E402
        ModelConfig,
        tiny_config,
    )
    import bench  # noqa: E402

    if args.tiny:
        cfg = tiny_config(num_experts=8, num_experts_per_tok=2,
                          moe_intermediate_size=64,
                          intermediate_size=0).replace(name="tiny-moe")
        params = bench.build_params(cfg, 4, 32, False, pad_free=True)
        row = bench.run_spec_config(cfg, params, batch=4, kv_bits=16,
                                    spec_k=2, page_size=64, period=16,
                                    reps=2, max_new=24)
    else:
        cfg = ModelConfig.from_pretrained("qwen3-30b-a3b").replace(
            num_layers=args.layers, name=f"qwen3-30b-a3b-L{args.layers}",
            act_bits=8)
        params = bench.build_params(cfg, 4, 256, False, pad_free=False)
        jax.block_until_ready(params)
        bench.log(f"moe params ready: {bench.tree_bytes(params)/1e9:.2f} GB")
        row = bench.run_spec_config(cfg, params, batch=args.batch, kv_bits=8,
                                    spec_k=args.spec_k, page_size=512,
                                    period=48, reps=4, max_new=args.max_new)
    print(row)


if __name__ == "__main__":
    main()
