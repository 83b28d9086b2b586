"""Request/response dataclasses and pure helpers shared by the
serving engines (continuous-batching scheduler, PP wave scheduler).

Split out of engine/scheduler.py (round 5): the request state machine the
reference only gestures at (reference: layers/include/iengine.cuh:23-48)
plus the chain-acceptance math used by every speculative path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from qwen_inference_engine_tpu.ops.sampling import SamplingParams, sample_rows


@dataclasses.dataclass
class Request:
    request_id: int
    prompt: List[int]
    max_new_tokens: int = 128
    sampling: Optional[SamplingParams] = None
    # wall-clock budget from submission; exceeded -> finish_reason "timeout"
    # (the reference has no notion of this: its engine runs one request to
    # completion unconditionally)
    timeout_s: Optional[float] = None
    # extra per-request stop token ids (on top of the model's EOS set;
    # like EOS, the stop token is the final entry of the output)
    stop_token_ids: Optional[Sequence[int]] = None


@dataclasses.dataclass
class _Running:
    request: Request
    slot: int
    pages: List[int]
    seq_len: int                      # final length once prefilled
    generated: List[int] = dataclasses.field(default_factory=list)
    last_token: int = 0
    t_submit: float = 0.0
    prefilled: int = 0                # prompt tokens already in cache
    cached_prefix: int = 0            # leading pages[i] shared via prefix cache
    admit_seq: int = 0                # monotonic admission order
    # incremental prompt-lookup state (speculative decoding): ngram ->
    # latest start position, maintained lazily by _pld_draft_host so each
    # round costs O(new tokens), not O(history)
    pld_hist: Optional[List[int]] = None
    pld_index: Dict[tuple, int] = dataclasses.field(default_factory=dict)
    pld_done: int = 0

    @property
    def prefill_done(self) -> bool:
        return self.prefilled >= len(self.request.prompt)


@dataclasses.dataclass
class FinishedRequest:
    request_id: int
    token_ids: List[int]
    finish_reason: str    # eos | length | rejected | cancelled | timeout


def _accept_chain(logits, drafts, rkey, sp_dyn, seen, active, *, k, k_cap,
                  approx):
    """Sample the model's own k+1-token chain from verify logits (seen-mask
    sequential semantics), accept the longest draft prefix equal to it.

    Returns (chain [B, k+1], n_new [B] in 1..k+1, seen'): the seen mask is
    rebuilt from the original plus only the EMITTED tokens of ACTIVE rows,
    so rejected positions and mid-prefill slots leave no trace."""
    B = logits.shape[0]
    seen0 = seen
    rows = jnp.arange(B)
    chain = []
    for j in range(k + 1):
        tok_j = sample_rows(
            logits[:, j], jax.random.fold_in(rkey, j),
            k_cap=k_cap, approx_top_k=approx, seen_mask=seen, **sp_dyn)
        seen = seen.at[rows, tok_j].set(True)
        chain.append(tok_j)
    chain = jnp.stack(chain, axis=1)                # [B, k+1]
    match = drafts == chain[:, :-1]
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
    n_new = jnp.sum(acc, axis=1) + 1                # [B] in 1..k+1
    keep = jnp.logical_and(
        jnp.arange(k + 1)[None, :] < n_new[:, None], active[:, None])
    seen = seen0
    for j in range(k + 1):
        seen = seen.at[rows, chain[:, j]].max(keep[:, j])
    return chain, n_new, seen


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _is_stop(tok: int, eos: set, run: "_Running") -> bool:
    st = run.request.stop_token_ids
    return tok in eos or (st is not None and tok in st)
