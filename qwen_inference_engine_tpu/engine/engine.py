"""Inference engine: jitted prefill/decode steps + host generation loop.

TPU-native replacement for the reference's driver loop
(reference: layers/src/iengine.cu:226-482 — ``main()`` calling ``llm()``
once per token with a ``getchar()`` pause, 40×13 kernel launches and a
cudaDeviceSynchronize per op).  Here:

* prefill and decode are each ONE jitted function (sampling fused in, so
  the only per-token host traffic is the sampled ids — the reference also
  D2H's one int per token, qwen_main.cu:396, but after a fully synchronous
  step);
* the KV cache is donated to every step, so XLA updates it in place;
* prompt lengths are padded to power-of-two buckets to bound recompiles;
* EOS (config-driven, ≙ the hardcoded 151645 check at qwen_main.cu:257)
  masks finished sequences on-device; the host just watches the flags;
* optionally everything runs under a ``Mesh`` with TP/DP NamedShardings
  (parallel/sharding.py) — same code path, GSPMD inserts the collectives.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import (
    decode_step,
    decode_step_pumped,
    prefill_chunked,
    pumped_supported,
)
from qwen_inference_engine_tpu.ops.sampling import (
    SamplingParams,
    sample,
    seen_mask_from_prompts,
    update_seen_mask,
)
from qwen_inference_engine_tpu.parallel.sharding import (
    cache_pspecs,
    make_sharded_cache,
    param_pspecs,
)
from qwen_inference_engine_tpu.utils.metrics import Metrics


@dataclasses.dataclass
class GenerationResult:
    token_ids: List[List[int]]      # generated ids per sequence (no prompt)
    ttft_s: float                   # time to first token (this call)
    decode_tokens_per_s: float      # aggregate decode throughput
    steps: int


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class Engine:
    """Fixed-batch generation engine over a contiguous KV cache.

    For continuous batching / paged KV, see scheduler.ContinuousBatchingEngine.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        *,
        mesh=None,
        max_batch: int = 8,
        max_seq: int = 2048,
        kv_dtype=jnp.bfloat16,
        sampling: Optional[SamplingParams] = None,
        seed: int = 1234,
        use_pallas: bool = True,
        track_repetition: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.kv_dtype = kv_dtype
        self.sampling = sampling or SamplingParams()
        self.seed = seed
        # Pallas custom calls are not GSPMD-partitionable. Under a
        # multi-device mesh the step therefore runs through shard_map
        # (parallel/tp_step.py) so the kernels execute per shard at full
        # speed; models whose shapes can't split over the mesh fall back
        # to the partitionable XLA paths (einsum attention, dequant einsum).
        self._tp_step = False
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            from qwen_inference_engine_tpu.parallel.tp_step import supports_tp

            tp = dict(mesh.shape).get("model", 1)
            if tp > 1 and dict(mesh.shape).get("data", 1) >= 1 and \
                    supports_tp(cfg, params, tp):
                self._tp_step = True
            else:
                use_pallas = False
        self.use_pallas = use_pallas
        self.metrics = Metrics()
        if track_repetition is None:
            track_repetition = (self.sampling.repetition_penalty != 1.0
                                or self.sampling.presence_penalty != 0.0)
        self.track_repetition = track_repetition

        if mesh is not None:
            self._data_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
        self._jit_cache = {}

    # ------------------------------------------------------------------
    def new_cache(self) -> KVCache:
        cache = KVCache.create(
            self.cfg.num_layers, self.max_batch, self.max_seq,
            self.cfg.num_kv_heads, self.cfg.head_dim, dtype=self.kv_dtype,
        )
        return make_sharded_cache(cache, self.mesh)

    # ------------------------------------------------------------------
    # jitted steps (sampling fused)
    # ------------------------------------------------------------------
    def _cache_template(self) -> KVCache:
        """Shape/dtype skeleton of new_cache() (no device allocation)."""
        S = -(-self.max_seq // 256) * 256
        shape = (self.cfg.num_layers, self.max_batch, self.cfg.num_kv_heads,
                 S, self.cfg.head_dim)
        quant = self.kv_dtype == jnp.int8
        sds = jax.ShapeDtypeStruct
        return KVCache(
            k=sds(shape, self.kv_dtype), v=sds(shape, self.kv_dtype),
            k_scale=sds(shape[:-1], jnp.float32) if quant else None,
            v_scale=sds(shape[:-1], jnp.float32) if quant else None,
        )

    def _tp_forward_fns(self):
        """shard_map'd prefill/decode forwards (built once per cache shape)."""
        from qwen_inference_engine_tpu.parallel.tp_step import (
            make_tp_decode_fn,
            make_tp_prefill_fn,
        )

        cache = self._cache_template()
        key = ("tp_fwd", cache.k.shape, str(cache.k.dtype))
        if key not in self._jit_cache:
            self._jit_cache[key] = (
                make_tp_prefill_fn(self.cfg, self.mesh, self.params, cache,
                                   chunk=512),
                make_tp_decode_fn(self.cfg, self.mesh, self.params, cache,
                                  uniform_decode=False),
                make_tp_decode_fn(self.cfg, self.mesh, self.params, cache,
                                  uniform_decode=True),
            )
        return self._jit_cache[key]

    def _prefill_step(self, sp_static):
        cfg, use_pallas = self.cfg, self.use_pallas
        tp_fns = self._tp_forward_fns() if self._tp_step else None

        def fn(params, tokens, lengths, cache, key, sp, seen):
            if tp_fns is not None:
                logits, cache = tp_fns[0](params, tokens, lengths, cache)
            else:
                logits, cache = prefill_chunked(params, cfg, tokens, lengths,
                                                cache, chunk=512,
                                                use_pallas=use_pallas)
            sp_full = dataclasses.replace(
                sp_static, temperature=sp["temperature"], top_p=sp["top_p"],
                repetition_penalty=sp["repetition_penalty"],
                presence_penalty=sp["presence_penalty"])
            tok = sample(logits, key, sp_full, seen)
            if seen is not None:
                seen = update_seen_mask(seen, tok)
            return tok, cache, seen

        donate = (3,)  # cache
        return jax.jit(fn, donate_argnums=donate)

    def _decode_step(self, sp_static, uniform: bool):
        cfg, use_pallas = self.cfg, self.use_pallas
        eos = jnp.asarray(list(cfg.eos_token_ids), jnp.int32)
        tp_fns = self._tp_forward_fns() if self._tp_step else None
        # double-pumped fused decode (ops/fused_step.py): aligned batches on
        # a single chip where the INT4 fused kernel covers the model
        pumped = (tp_fns is None and uniform and use_pallas
                  and jax.default_backend() == "tpu"
                  and pumped_supported(cfg, self.params,
                                       self._cache_template(),
                                       self.max_batch))

        def fn(params, tok, pos, cache, key, sp, seen, done):
            if tp_fns is not None:
                logits, cache = tp_fns[2 if uniform else 1](params, tok, pos,
                                                           cache)
            elif pumped:
                logits, cache = decode_step_pumped(params, cfg, tok, pos,
                                                   cache)
            else:
                logits, cache = decode_step(params, cfg, tok, pos, cache,
                                            use_pallas=use_pallas,
                                            uniform_decode=uniform)
            sp_full = dataclasses.replace(
                sp_static, temperature=sp["temperature"], top_p=sp["top_p"],
                repetition_penalty=sp["repetition_penalty"],
                presence_penalty=sp["presence_penalty"])
            nxt = sample(logits, key, sp_full, seen)
            if seen is not None:
                seen = update_seen_mask(seen, nxt)
            is_eos = jnp.any(nxt[:, None] == eos[None, :], axis=-1)
            nxt = jnp.where(done, 0, nxt)
            done = done | (is_eos & ~done)
            return nxt, cache, seen, done

        return jax.jit(fn, donate_argnums=(3,))

    def _get_jitted(self, kind: str, sp: SamplingParams, uniform: bool = False):
        key = (kind, sp.top_k, sp.greedy, self.track_repetition, uniform)
        if key not in self._jit_cache:
            if kind == "prefill":
                self._jit_cache[key] = self._prefill_step(sp)
            else:
                self._jit_cache[key] = self._decode_step(sp, uniform)
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def generate_speculative(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 128,
        *,
        k: int = 8,
        ngram: int = 3,
    ) -> List[List[int]]:
        """Greedy generation with prompt-lookup speculation (token-exact
        vs generate(greedy); 1..k+1 tokens per forward). See
        engine/speculative.py."""
        from qwen_inference_engine_tpu.engine.speculative import (
            generate_speculative,
        )

        # Pallas kernels are not GSPMD-partitionable: under a multi-device
        # mesh the speculative forward (which bypasses the shard_map TP
        # step) must take the partitionable XLA paths
        use_pallas = self.use_pallas
        if self.mesh is not None and getattr(self.mesh, "size", 1) > 1:
            use_pallas = False
        cache = self.new_cache()
        return generate_speculative(
            self.params, self.cfg, list(prompts), cache,
            max_new_tokens=max_new_tokens, k=k, ngram=ngram,
            use_pallas=use_pallas)

    # ------------------------------------------------------------------
    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 128,
        sampling: Optional[SamplingParams] = None,
        seed: Optional[int] = None,
    ) -> GenerationResult:
        sp = sampling or self.sampling
        assert len(prompts) <= self.max_batch, (len(prompts), self.max_batch)
        B = self.max_batch
        lens_list = [len(p) for p in prompts]
        max_len = max(lens_list)
        T = _bucket(max_len)
        assert T + max_new_tokens <= self.max_seq, "prompt+gen exceeds max_seq"

        tokens = np.zeros((B, T), np.int32)
        lens = np.ones((B,), np.int32)  # padded slots get len 1 (harmless)
        for i, p in enumerate(prompts):
            tokens[i, : len(p)] = p
            lens[i] = len(p)
        tokens = jnp.asarray(tokens)
        lens_d = jnp.asarray(lens)
        if self.mesh is not None:
            tokens = jax.device_put(tokens, NamedSharding(self.mesh, P("data", None)))
            lens_d = jax.device_put(lens_d, self._data_sharding)

        # a per-call SamplingParams requesting a penalty must not be
        # silently dropped when the engine default is penalty-free
        # (advisor r3): derive the seen mask from the EFFECTIVE params
        seen = None
        if (self.track_repetition or sp.repetition_penalty != 1.0
                or sp.presence_penalty != 0.0):
            seen = seen_mask_from_prompts(tokens, lens_d, self.cfg.vocab_size)

        sp_dyn = {
            "temperature": jnp.float32(sp.temperature),
            "top_p": jnp.float32(sp.top_p),
            "repetition_penalty": jnp.float32(sp.repetition_penalty),
            "presence_penalty": jnp.float32(sp.presence_penalty),
        }
        base_key = jax.random.PRNGKey(self.seed if seed is None else seed)
        cache = self.new_cache()

        pre = self._get_jitted("prefill", sp)
        # aligned batch (all prompts same length) -> uniform decode
        # positions -> single-tile in-place KV appends (ops/kv_append.py)
        uniform = bool(np.all(lens == lens[0]))
        dec = self._get_jitted("decode", sp, uniform)

        t0 = time.perf_counter()
        tok, cache, seen = pre(self.params, tokens, lens_d, cache,
                               jax.random.fold_in(base_key, 0), sp_dyn, seen)
        first = np.asarray(tok)  # value fetch = true sync on this runtime
        ttft = time.perf_counter() - t0
        self.metrics.observe_ttft(ttft)

        out_cols = [tok]  # device arrays; fetched once at the end
        eos_np = np.asarray(list(self.cfg.eos_token_ids))
        done = jnp.asarray(np.isin(first, eos_np))

        t1 = time.perf_counter()
        steps = 0
        # tokens stay on device; EOS is polled on an ADAPTIVE cadence so
        # the host never blocks the per-token critical path (a value fetch
        # costs a full RTT through remote-device transports): early polls
        # are dense to catch short answers with few wasted decode steps,
        # then the interval doubles to a 64-step steady state so long
        # generations pay ~RTT/64 per token instead of the fixed RTT/16.
        eos_every = 4
        next_poll = eos_every
        for step in range(1, max_new_tokens):
            pos = lens_d + step - 1
            key = jax.random.fold_in(base_key, step)
            tok, cache, seen, done = dec(self.params, tok, pos, cache, key,
                                         sp_dyn, seen, done)
            out_cols.append(tok)
            steps += 1
            if step >= next_poll:
                if bool(np.asarray(jnp.all(done))):
                    break
                eos_every = min(eos_every * 2, 64)
                next_poll = step + eos_every
        mat_d = jnp.stack(out_cols, axis=1)
        mat_np = np.asarray(mat_d)  # single sync for the whole generation
        dt = max(time.perf_counter() - t1, 1e-9)
        n_real = len(prompts)
        self.metrics.observe_decode(steps * n_real, dt)

        mat = mat_np  # [B, steps+1]
        outs: List[List[int]] = []
        for i in range(n_real):
            row = mat[i].tolist()
            clipped = []
            for t in row:
                clipped.append(int(t))
                if t in self.cfg.eos_token_ids:
                    break
            outs.append(clipped)
        return GenerationResult(
            token_ids=outs,
            ttft_s=ttft,
            decode_tokens_per_s=steps * n_real / dt if steps else 0.0,
            steps=steps + 1,
        )
