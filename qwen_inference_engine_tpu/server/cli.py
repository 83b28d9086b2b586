"""CLI: the user-facing flag surface the reference never had
(reference driver: layers/src/iengine.cu:226-482 — no args, hardcoded
prompt ids, weights path baked in, one token per getchar()).

Subcommands:
  qie generate  --model ... --prompt "..." [--ckpt DIR] [--bits 4|8|16] ...
  qie serve     --model ... --port 8000 ...   (HTTP continuous batching)
  qie bench     (delegates to bench.py's main)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="qwen2-0.5b",
                   help="preset name or HF checkpoint dir")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir with safetensors (random init if absent)")
    p.add_argument("--qckpt", default=None,
                   help="pre-quantized checkpoint dir (from `qie quantize`)")
    p.add_argument("--bits", type=int, default=16, choices=(4, 8, 16),
                   help="weight-only quantization")
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--act-bits", type=int, default=0, choices=(0, 8),
                   help="8 = W4A8/W8A8: per-token int8 activation quant "
                        "in the block projections (s8@s8 MXU dots, ~2x "
                        "the bf16 pass rate on v5e; requires --bits 4|8; "
                        "use --group-size >= 256 for the full rate)")
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16, 32),
                   help="8=int8 KV, 16=bf16, 32=f32 (CPU runtimes: XLA:CPU "
                        "has no bf16 dot — use 32 there)")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel size (0 = all devices)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel size")
    p.add_argument("--ep", type=int, default=0,
                   help="expert-parallel size for MoE models (slots and "
                        "experts sharded over an ('ep',) mesh; overrides "
                        "--tp/--dp)")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel stages (layer-sharded weights/"
                        "KV, FIFO wave serving with a 1F1B greedy fast "
                        "path; overrides --tp/--dp/--ep)")
    p.add_argument("--f32", action="store_true",
                   help="f32 weights for the tiny smoke model (CPU runs)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--platform", default=None, choices=("tpu", "cpu"),
                   help="force a JAX platform (cpu useful for testing)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of generation into DIR")


def _add_sampling_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--repetition-penalty", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--exact-top-k", action="store_true",
                   help="exact sort-based top-k selection; default uses "
                        "the TPU bucketed approx_max_k (~95%% recall, "
                        "saves ~3 ms/tick over a 152k vocab; greedy rows "
                        "are always exact argmax either way)")


def _approx_topk(args) -> bool:
    """Serving default: TPU-native approx top-k unless --exact-top-k."""
    import jax

    return (not getattr(args, "exact_top_k", False)
            and jax.default_backend() == "tpu")


def build_model(args):
    """Shared model/params construction for generate and serve."""
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from qwen_inference_engine_tpu.config import ModelConfig
    from qwen_inference_engine_tpu.loader.safetensors_loader import load_checkpoint
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.parallel.mesh import make_mesh
    from qwen_inference_engine_tpu.parallel.sharding import shard_params
    from qwen_inference_engine_tpu.quant.quantize import QuantConfig, quantize_params
    from qwen_inference_engine_tpu.tokenizer import load_tokenizer

    if getattr(args, "qckpt", None):
        from qwen_inference_engine_tpu.loader.qcheckpoint import load_quantized

        cfg, params = load_quantized(args.qckpt)
        tok = load_tokenizer(args.ckpt or args.qckpt)
    elif args.ckpt:
        cfg, params = load_checkpoint(args.ckpt)
        tok = load_tokenizer(args.ckpt)
    elif args.model == "tiny":
        # byte-vocab smoke model (random weights, matches the ByteTokenizer)
        from qwen_inference_engine_tpu.config import tiny_config

        dt = jnp.float32 if getattr(args, "f32", False) else jnp.bfloat16
        cfg = tiny_config(vocab_size=512)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=dt)
        tok = load_tokenizer(None)
    else:
        cfg = ModelConfig.from_pretrained(args.model)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        tok = load_tokenizer(None)
        print("note: no --ckpt given; using RANDOM weights", file=sys.stderr)

    if args.bits < 16 and not getattr(args, "qckpt", None):
        params = quantize_params(
            params, QuantConfig(bits=args.bits, group_size=args.group_size))
    if getattr(args, "act_bits", 0):
        if args.bits >= 16:
            print("error: --act-bits requires --bits 4 or 8",
                  file=sys.stderr)
            raise SystemExit(2)
        cfg = cfg.replace(act_bits=args.act_bits)

    mesh = None
    n_dev = len(jax.devices())
    pp = getattr(args, "pp", 0)
    if pp and pp > 1:
        # pipeline-parallel serving mesh: raw params returned — the PP
        # wave scheduler layer-shards weights/KV itself (shard_for_pp)
        from qwen_inference_engine_tpu.parallel.pp_step import make_pp_mesh

        return cfg, params, tok, make_pp_mesh(pp)
    ep = getattr(args, "ep", 0)
    if ep and ep > 1:
        # expert-parallel serving mesh for MoE presets (parallel/ep_step)
        from qwen_inference_engine_tpu.parallel.ep_step import (
            make_ep_mesh,
            shard_for_ep,
        )

        if not cfg.is_moe:
            print("--ep requires a MoE model; ignoring", file=sys.stderr)
        else:
            mesh = make_ep_mesh(ep)
            params = shard_for_ep(params, mesh)
            return cfg, params, tok, mesh
    tp = args.tp or (n_dev // args.dp)
    if tp * args.dp > 1:
        mesh = make_mesh((args.dp, tp))
        params = shard_params(params, mesh)
    return cfg, params, tok, mesh


def build_draft_model(args):
    """Optional small drafter for --speculative serving: same-vocab model
    from --draft-ckpt (checkpoint) or --draft-model (preset, random
    weights). Returns (draft_cfg, draft_params) or (None, None)."""
    from qwen_inference_engine_tpu.config import ModelConfig
    from qwen_inference_engine_tpu.loader.safetensors_loader import (
        load_checkpoint,
    )
    from qwen_inference_engine_tpu.models.qwen import init_params
    from qwen_inference_engine_tpu.quant.quantize import (
        QuantConfig,
        quantize_params,
    )

    if getattr(args, "draft_ckpt", None):
        dcfg, dparams = load_checkpoint(args.draft_ckpt)
    elif getattr(args, "draft_model", None):
        import jax
        import jax.numpy as jnp

        dcfg = ModelConfig.from_pretrained(args.draft_model)
        dparams = init_params(dcfg, jax.random.PRNGKey(1),
                              dtype=jnp.bfloat16)
        print("note: no --draft-ckpt given; drafter uses RANDOM weights",
              file=sys.stderr)
    else:
        return None, None
    if args.bits < 16:
        dparams = quantize_params(
            dparams, QuantConfig(bits=args.bits,
                                 group_size=args.group_size))
    return dcfg, dparams


def cmd_generate(args) -> int:
    import jax.numpy as jnp

    from qwen_inference_engine_tpu.engine.engine import Engine
    from qwen_inference_engine_tpu.ops.sampling import SamplingParams

    cfg, params, tok, mesh = build_model(args)
    sp = SamplingParams(temperature=args.temperature, top_k=args.top_k,
                        top_p=args.top_p,
                        repetition_penalty=args.repetition_penalty,
                        greedy=args.greedy,
                        approx_top_k=_approx_topk(args))
    prompts_text = args.prompt or ["Hello"]
    if args.chat:
        prompts_text = [
            tok.apply_chat_template([{"role": "user", "content": t}])
            for t in prompts_text
        ]
    prompt_ids = [tok.encode(t) for t in prompts_text]

    eng = Engine(cfg, params, mesh=mesh, max_batch=max(1, len(prompt_ids)),
                 max_seq=args.max_seq,
                 kv_dtype={8: jnp.int8, 32: jnp.float32}.get(
                     args.kv_bits, jnp.bfloat16),
                 sampling=sp, seed=args.seed)
    from qwen_inference_engine_tpu.utils.profiling import trace

    t0 = time.perf_counter()
    with trace(args.profile):
        if args.speculative:
            ids_out = eng.generate_speculative(
                prompt_ids, max_new_tokens=args.max_new_tokens, k=args.spec_k)
            from qwen_inference_engine_tpu.engine.engine import (
                GenerationResult,
            )

            res = GenerationResult(token_ids=ids_out, ttft_s=0.0,
                                   decode_tokens_per_s=0.0,
                                   steps=max(len(t) for t in ids_out))
        else:
            res = eng.generate(prompt_ids, max_new_tokens=args.max_new_tokens)
    dt = time.perf_counter() - t0
    for i, ids in enumerate(res.token_ids):
        print(f"--- sequence {i} ({len(ids)} tokens) ---")
        print(tok.decode(ids))
    print(f"[ttft {res.ttft_s*1e3:.0f} ms | {res.decode_tokens_per_s:.1f} tok/s "
          f"| total {dt:.2f}s]", file=sys.stderr)
    if args.stats:
        print(json.dumps(eng.metrics.snapshot()), file=sys.stderr)
    return 0


def cmd_serve(args) -> int:
    from qwen_inference_engine_tpu.server.http import serve

    return serve(args)


def cmd_quantize(args) -> int:
    """Offline packer: HF safetensors -> quantized checkpoint dir
    (the analogue of the reference's one-shot weights.bin concatenation,
    tensor_parser.cpp:48-49,118-121 — but packed INT4/INT8 + manifest)."""
    from qwen_inference_engine_tpu.loader.qcheckpoint import save_quantized

    cfg, params, tok, mesh = build_model(args)
    save_quantized(args.out, cfg, params)
    print(f"wrote quantized checkpoint (INT{args.bits}, g={args.group_size}) "
          f"to {args.out}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="qie",
                                     description="TPU-native Qwen inference engine")
    sub = parser.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="batch text generation")
    _add_model_args(g)
    _add_sampling_args(g)
    g.add_argument("--prompt", action="append", default=None,
                   help="prompt text (repeatable for a batch)")
    g.add_argument("--chat", action="store_true", help="wrap in chat template")
    g.add_argument("--stats", action="store_true", help="dump metrics JSON")
    g.add_argument("--speculative", action="store_true",
                   help="greedy prompt-lookup speculative decoding "
                        "(token-identical to --greedy, fewer forwards)")
    g.add_argument("--spec-k", type=int, default=8,
                   help="drafted tokens per speculation round")
    g.set_defaults(fn=cmd_generate)

    s = sub.add_parser("serve", help="HTTP server with continuous batching")
    _add_model_args(s)
    _add_sampling_args(s)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--max-slots", type=int, default=8)
    s.add_argument("--page-size", type=int, default=512,
                   help="KV page size in tokens (the paged-attention "
                        "wall is per-page-DMA issue cost: 16 measured "
                        "9x slower than 512 at b96xS1500, docs/PERF.md "
                        "r4)")
    s.add_argument("--num-pages", type=int, default=0,
                   help="KV page pool size (0 = sized from --max-slots x "
                        "--max-seq plus prefix-cache slack)")
    s.add_argument("--no-prefix-cache", action="store_true",
                   help="disable automatic prefix caching (page reuse "
                        "across requests sharing a prompt prefix)")
    s.add_argument("--step-ticks", type=int, default=8,
                   help="decode ticks chained on device per host sync in "
                        "the serving loop (1 = sync every token)")
    s.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding in the "
                        "scheduler tick (1..k+1 tokens per forward; greedy "
                        "requests stay token-identical)")
    s.add_argument("--spec-k", type=int, default=4,
                   help="drafted tokens per speculation round")
    s.add_argument("--spec-ngram", type=int, default=3,
                   help="suffix length for prompt-lookup draft matching")
    s.add_argument("--draft-model", default=None,
                   help="small same-vocab model preset for draft-model "
                        "speculation (replaces prompt-lookup drafts)")
    s.add_argument("--draft-ckpt", default=None,
                   help="checkpoint dir for the draft model")
    s.add_argument("--top-k-cap", type=int, default=None,
                   help="compiled top-k selection width; per-request "
                        "top_k above it returns 400 (default: "
                        "max(64, --top-k), or the vocab when --top-k 0)")
    s.set_defaults(fn=cmd_serve)

    qz = sub.add_parser("quantize",
                        help="pack an HF checkpoint into a quantized checkpoint")
    _add_model_args(qz)
    qz.add_argument("--out", required=True, help="output checkpoint dir")
    qz.set_defaults(fn=cmd_quantize)

    b = sub.add_parser("bench", help="run the headline benchmark")
    b.set_defaults(fn=lambda a: __import__("bench").main() or 0)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
