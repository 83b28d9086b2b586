"""Attribute the PAGED serving decode tick's cost at the step level.

The r4 page-size fix took the b96×S1500 serving tick from 266.7 ms to
~44 ms, still ~1.8× the contiguous path. This ablation scans N steps of
the paged decode inside ONE jit (no dispatch noise) and monkeypatches
one component at a time to identity:

  full      — paged forward + per-row dynamic sampling (serving tick)
  greedy    — sampling replaced by plain argmax
  no-append — paged_append_ragged patched to identity (stale KV; timing)
  no-attn   — paged attention patched to zeros (timing only)
  contig    — contiguous decode_step at the same shapes (reference)

Usage: python scripts/ablate_paged.py [batch] [ctx] [page]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache, PagedKVCache
import qwen_inference_engine_tpu.models.qwen as qw
import qwen_inference_engine_tpu.ops.kv_append as kva
import qwen_inference_engine_tpu.ops.paged_attention as pga
from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample_rows

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
PAGE = int(sys.argv[3]) if len(sys.argv) > 3 else 128
N_STEPS = 12

cfg = ModelConfig.from_pretrained("qwen2.5-7b")
params = qw.init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                  group_size=256, quantize_lm_head=True,
                                  pad_free=True)
jax.block_until_ready(params)
print(f"ablate_paged b{B} ctx{CTX} page{PAGE} on "
      f"{jax.devices()[0].device_kind}", flush=True)

pages_per_seq = -(-(CTX + 64) // PAGE)
npages = B * pages_per_seq + 8
tables = np.arange(1, B * pages_per_seq + 1,
                   dtype=np.int32).reshape(B, pages_per_seq)
tables_d = jnp.asarray(tables)
sp_dyn = {
    "temperature": jnp.full((B,), 0.7, jnp.float32),
    "top_p": jnp.ones((B,), jnp.float32),
    "repetition_penalty": jnp.ones((B,), jnp.float32),
    "presence_penalty": jnp.zeros((B,), jnp.float32),
    "top_k": jnp.full((B,), 50, jnp.int32),
    "greedy": jnp.zeros((B,), bool),
}
seen0 = jnp.zeros((B, cfg.vocab_size), jnp.bool_)


def run(label, *, sampling="rows", patch_append=False, patch_attn=False,
        contig=False, approx=True):
    orig_append = kva.paged_append_ragged
    orig_attn = pga.paged_decode_attention_stacked
    orig_attn8 = pga.paged_decode_attention_stacked_q8
    try:
        if patch_append:
            kva.paged_append_ragged = \
                lambda k, v, kn, vn, pos, bt, l, *, page_size: (k, v)
        if patch_attn:
            pga.paged_decode_attention_stacked = \
                lambda q, kp, vp, bt, sl, ps, l, scale=None: (
                    jnp.zeros_like(q))
            pga.paged_decode_attention_stacked_q8 = \
                lambda q, kp, vp, ks, vs, bt, sl, ps, l, scale=None: (
                    jnp.zeros_like(q))

        if contig:
            S = -(-(CTX + 64) // 256) * 256
            cache = KVCache.create(cfg.num_layers, B, S, cfg.num_kv_heads,
                                   cfg.head_dim, dtype=jnp.int8)
        else:
            cache = PagedKVCache.create(cfg.num_layers, npages, PAGE,
                                        cfg.num_kv_heads, cfg.head_dim,
                                        dtype=jnp.int8)

        @jax.jit
        def many(params, cache, seen):
            def step(carry, i):
                tok, cache, seen = carry
                pos = jnp.full((B,), CTX, jnp.int32) + i
                if contig:
                    logits, cache = qw.decode_step(
                        params, cfg, tok, pos, cache, uniform_decode=True)
                else:
                    logits, cache = qw.decode_step(
                        params, cfg, tok, pos, cache,
                        block_tables=tables_d)
                if sampling == "rows":
                    tok = sample_rows(
                        logits, jax.random.fold_in(jax.random.PRNGKey(1), i),
                        k_cap=64, approx_top_k=approx, seen_mask=seen,
                        **sp_dyn)
                    seen = seen.at[jnp.arange(B), tok].set(True)
                else:
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                return (tok, cache, seen), None

            (tok, cache, seen), _ = jax.lax.scan(
                step, (jnp.zeros((B,), jnp.int32), cache, seen),
                jnp.arange(N_STEPS))
            return tok

        r = many(params, cache, seen0)
        np.asarray(r)

        def t(reps):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = many(params, cache, seen0)
            np.asarray(r)
            return time.perf_counter() - t0

        lo = min(t(1) for _ in range(3))
        hi = min(t(3) for _ in range(3))
        ms = (hi - lo) / 2 / N_STEPS * 1e3
        print(f"{label:34s} {ms:7.2f} ms/step", flush=True)
        del cache
        return ms
    finally:
        kva.paged_append_ragged = orig_append
        pga.paged_decode_attention_stacked = orig_attn
        pga.paged_decode_attention_stacked_q8 = orig_attn8


run("paged full (serving tick)")
run("paged greedy-argmax sampling", sampling="greedy")
run("paged sampling exact top-k", approx=False)
run("paged, append->identity", patch_append=True)
run("paged, attention->zeros", patch_attn=True)
run("paged, attn+append out", patch_attn=True, patch_append=True)
run("contiguous reference", contig=True)
