"""Perplexity evaluation harness (WikiText-2 protocol).

Gates the quantization accuracy targets (BASELINE.md: INT8 Δppl ≤ 0.1,
INT4 Δppl ≤ 0.5 vs FP16).  The standard protocol: concatenate the corpus,
tokenize once, split into fixed windows of ``seq_len``, sum token NLL over
all windows, ppl = exp(total_nll / total_tokens).

No dataset download is possible on this host — pass a local text file
(e.g. wikitext-2-raw/wiki.test.raw); tests use synthetic text, which is
valid for measuring quantization *deltas* (same data both arms).
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.kvcache.cache import KVCache
from qwen_inference_engine_tpu.models.qwen import score_logits


def nll_of_windows(
    params: dict,
    cfg: ModelConfig,
    token_windows: np.ndarray,  # [num_windows, seq_len] int32
    batch_size: int = 4,
    use_pallas: bool = True,
) -> tuple[float, int]:
    """Sum of next-token negative log-likelihoods over all windows.

    Each window scores positions 1..seq_len-1 (the first token has no
    context). Returns (total_nll, total_predicted_tokens).
    """
    num_windows, seq_len = token_windows.shape
    dummy_cache = KVCache.create(
        cfg.num_layers, batch_size, seq_len, cfg.num_kv_heads, cfg.head_dim
    )

    @jax.jit
    def window_nll(params, tokens, cache):
        logits = score_logits(params, cfg, tokens, cache, use_pallas=use_pallas)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        tok_lp = jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[..., 0]
        return -jnp.sum(tok_lp, axis=-1)  # [B]

    total_nll = 0.0
    total_tok = 0
    for i in range(0, num_windows, batch_size):
        chunk = token_windows[i : i + batch_size]
        real = chunk.shape[0]
        if real < batch_size:  # pad batch, drop padded rows after
            pad = np.repeat(chunk[-1:], batch_size - real, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        nll = np.asarray(window_nll(params, jnp.asarray(chunk), dummy_cache))
        total_nll += float(nll[:real].sum())
        total_tok += real * (seq_len - 1)
    return total_nll, total_tok


def perplexity(
    params: dict,
    cfg: ModelConfig,
    token_ids: Sequence[int],
    seq_len: int = 512,
    batch_size: int = 4,
    use_pallas: bool = True,
) -> float:
    """Windowed perplexity of a token stream."""
    ids = np.asarray(token_ids, np.int32)
    n_windows = len(ids) // seq_len
    if n_windows == 0:
        raise ValueError(f"need ≥{seq_len} tokens, got {len(ids)}")
    windows = ids[: n_windows * seq_len].reshape(n_windows, seq_len)
    nll, ntok = nll_of_windows(params, cfg, windows, batch_size, use_pallas)
    return math.exp(nll / ntok)


def perplexity_of_file(
    params: dict, cfg: ModelConfig, path: str, tokenizer, seq_len: int = 512,
    batch_size: int = 4,
) -> float:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return perplexity(params, cfg, tokenizer.encode(text), seq_len, batch_size)
