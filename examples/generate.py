"""End-to-end generation demo through the public package API.

Runs a random-weight Qwen model (any preset or a tiny config) and generates
tokens with prefill + decode + sampling — on whatever backend JAX picks
(the real TPU chip when available). Optionally quantizes to INT8/INT4 and
uses an INT8 KV cache.

Usage:
    python examples/generate.py [--model qwen2-0.5b|tiny] [--bits 16|8|4]
                                [--kv-bits 16|8] [--steps 32] [--batch 1]
                                [--greedy]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--bits", type=int, default=16, choices=(4, 8, 16))
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16))
    p.add_argument("--act-bits", type=int, default=0, choices=(0, 8),
                   help="8 = per-token int8 activation quant in the block "
                        "projections (W4A8/W8A8 integer MXU dots)")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=16)
    p.add_argument("--max-seq", type=int, default=256)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from qwen_inference_engine_tpu.config import ModelConfig, tiny_config
    from qwen_inference_engine_tpu.kvcache.cache import KVCache
    from qwen_inference_engine_tpu.models.qwen import decode_step, init_params, prefill
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample
    from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_params

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    cfg = tiny_config() if args.model == "tiny" else ModelConfig.from_pretrained(args.model)
    print(f"model: {cfg.name}  L={cfg.num_layers} D={cfg.hidden_size} "
          f"Hq={cfg.num_heads} Hk={cfg.num_kv_heads} V={cfg.vocab_size}")

    t0 = time.perf_counter()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if args.bits < 16:
        params = quantize_params(params, QuantConfig(bits=args.bits))
        print(f"quantized projections to INT{args.bits}")
    if args.act_bits:
        if args.bits == 16:
            p.error("--act-bits requires --bits 4 or 8")
        cfg = cfg.replace(act_bits=args.act_bits)
        print(f"activation quant: A{args.act_bits} (integer MXU dots)")
    kv_dtype = jnp.int8 if args.kv_bits == 8 else jnp.bfloat16
    cache = KVCache.create(cfg.num_layers, args.batch, args.max_seq,
                           cfg.num_kv_heads, cfg.head_dim, dtype=kv_dtype)
    jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.2f}s")

    rng = np.random.default_rng(0)
    prompts = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(args.batch, args.prompt_len)).astype(np.int32))
    lens = jnp.full((args.batch,), args.prompt_len, jnp.int32)

    sp = SamplingParams(temperature=0.7, top_k=50, greedy=args.greedy)
    key = jax.random.PRNGKey(args.seed)

    jit_prefill = jax.jit(lambda p, t, l, c: prefill(p, cfg, t, l, c))
    jit_decode = jax.jit(lambda p, t, pos, c: decode_step(p, cfg, t, pos, c))
    jit_sample = jax.jit(lambda lg, k: sample(lg, k, sp))

    t0 = time.perf_counter()
    logits, cache = jit_prefill(params, prompts, lens, cache)
    tok = jit_sample(logits, jax.random.fold_in(key, 0))
    jax.block_until_ready(tok)
    ttft = time.perf_counter() - t0
    print(f"TTFT (incl. compile): {ttft*1e3:.1f} ms")

    generated = [np.asarray(tok)]
    t0 = time.perf_counter()
    for step in range(1, args.steps):
        pos = lens + step - 1
        logits, cache = jit_decode(params, tok, pos, cache)
        tok = jit_sample(logits, jax.random.fold_in(key, step))
        generated.append(np.asarray(tok))
    jax.block_until_ready(tok)
    dt = time.perf_counter() - t0
    toks = np.stack(generated, axis=1)  # [B, steps]
    print(f"decode: {args.steps - 1} steps x batch {args.batch} in {dt:.2f}s "
          f"→ {(args.steps - 1) * args.batch / dt:.1f} tok/s (incl. 1st-step compile)")
    print("generated token ids (seq 0):", toks[0].tolist())


if __name__ == "__main__":
    main()
