"""Matmul megacall ablation (VERDICT r2 #8 / ROADMAP perf #2).

Hypothesis: the decode step's ~1.3 ms of per-step matmul dispatch/glue
can shrink by fusing the five shared-input projections (q,k,v,gate,up —
same activation h, same K, same group size) into ONE N-concatenated
quant-matmul call per layer, keeping the proven manual-DMA kernel
structure (ops/quant_matmul.py) — the "megacall" — vs today's 7 calls
per layer.

Measures the pure matmul-chain step (scan over layers + lm_head, no
attention) at M tokens in both layouts on the real chip. Adopt if the
fused chain is >=1 ms faster per step at M=96; else this closes the
item as a documented negative.

Usage: python scripts/ablate_megacall.py [M]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
import qwen_inference_engine_tpu.models.qwen as qw
from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas


def log(*a):
    print(*a, flush=True)


def fuse_n(lins, pad_n: int = 0):
    """Concatenate stacked QuantLinears along N (same K / bits / gs).

    ``pad_n``: zero-pad the fused N up to this width — the concatenated
    N's divisor structure decides the kernel's bn block (e.g. gate+up =
    37888 = 2^10*37 only admits bn<=1024 under the VMEM budget, where
    the separate tensors ran bn=4736); a few % of zero columns can buy
    back a large block. This is the suspected reason the r2 naive
    fusion regressed."""
    l0 = lins[0]
    assert all(l.bits == l0.bits and l.group_size == l0.group_size
               and l.q.shape[1] == l0.q.shape[1] for l in lins)
    q = jnp.concatenate([l.q for l in lins], axis=-1)
    s = jnp.concatenate([l.scales for l in lins], axis=-1)
    bs = None
    if any(l.b is not None for l in lins):
        bs = jnp.concatenate(
            [l.b if l.b is not None else
             jnp.zeros((l.q.shape[0], l.out_features),
                       next(x.b for x in lins if x.b is not None).dtype)
             for l in lins], axis=-1)
    if pad_n and pad_n > q.shape[-1]:
        extra = pad_n - q.shape[-1]
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, extra)])
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, extra)])
        if bs is not None:
            bs = jnp.pad(bs, [(0, 0)] * (bs.ndim - 1) + [(0, extra)])
    return dataclasses.replace(l0, q=q, scales=s, b=bs)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = ModelConfig.from_pretrained("qwen2.5-7b")
    params = qw.init_quantized_params(cfg, jax.random.PRNGKey(0), bits=4,
                                      group_size=256, quantize_lm_head=True,
                                      pad_free=True)
    jax.block_until_ready(params)
    ly = params["layers"]
    log(f"ablate_megacall M={M} on {jax.devices()[0].device_kind}")

    # the two REAL shared-input groups in a layer: {q,k,v} read h,
    # {gate,up} read the post-attention residual
    n_q, n_k, n_v = (ly[k].out_features for k in ("q", "k", "v"))
    n_g = ly["gate"].out_features
    fused_qkv = fuse_n([ly["q"], ly["k"], ly["v"]])
    fused_gu = fuse_n([ly["gate"], ly["up"]])
    # padded variant: 2*18944=37888=2^10*37 only admits bn<=1024; pad to
    # 39424=128*308 (308=2^2*7*11) so bn=3584 fits the VMEM budget
    fused_gu_pad = fuse_n([ly["gate"], ly["up"]], pad_n=39424)
    jax.block_until_ready((fused_qkv.q, fused_gu.q, fused_gu_pad.q))

    # NOTE: every weight must flow through jit ARGUMENTS — a closure
    # capture bakes gigabytes of constants into the HLO and the compile
    # never finishes through the remote compile helper (first r4 attempt)
    def layer_split(lyr, h, l):
        q = quant_matmul_pallas(h, lyr["q"], layer=l)
        kk = quant_matmul_pallas(h, lyr["k"], layer=l)
        v = quant_matmul_pallas(h, lyr["v"], layer=l)
        o = quant_matmul_pallas(q, lyr["o"], layer=l)
        h2 = h + o
        g = quant_matmul_pallas(h2, lyr["gate"], layer=l)
        u = quant_matmul_pallas(h2, lyr["up"], layer=l)
        d = quant_matmul_pallas(jax.nn.silu(g) * u, lyr["down"], layer=l)
        # keep k/v live so nothing is DCE'd
        return h + d + 1e-6 * (kk.sum() + v.sum())

    def layer_fused(extra, h, l):
        fq, gu, lyr = extra["qkv"], extra["gu"], extra["ly"]
        qkv = quant_matmul_pallas(h, fq, layer=l)
        q = qkv[:, :n_q]
        kk = qkv[:, n_q:n_q + n_k]
        v = qkv[:, n_q + n_k:n_q + n_k + n_v]
        o = quant_matmul_pallas(q, lyr["o"], layer=l)
        h2 = h + o
        gu_out = quant_matmul_pallas(h2, gu, layer=l)
        g, u = gu_out[:, :n_g], gu_out[:, n_g:2 * n_g]
        d = quant_matmul_pallas(jax.nn.silu(g) * u, lyr["down"], layer=l)
        return h + d + 1e-6 * (kk.sum() + v.sum())

    @jax.jit
    def run_split(params, x):
        def body(c, l):
            return layer_split(params["layers"], c, l), None
        x2, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers))
        return jnp.sum(
            quant_matmul_pallas(x2, params["lm_head"]).astype(jnp.float32))

    @jax.jit
    def run_fused(params, extra, x):
        def body(c, l):
            return layer_fused(extra, c, l), None
        x2, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers))
        return jnp.sum(
            quant_matmul_pallas(x2, params["lm_head"]).astype(jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, cfg.hidden_size),
                           jnp.bfloat16)

    def timeit(call):
        np.asarray(call())              # compile

        def t(reps):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = call()
            np.asarray(r)
            return time.perf_counter() - t0

        lo = min(t(4) for _ in range(2))
        hi = min(t(16) for _ in range(2))
        return (hi - lo) / 12

    t_split = timeit(lambda: run_split(params, x0))
    log(f"split (7 calls/layer):            {t_split*1e3:.2f} ms/step")
    extra = {"qkv": fused_qkv, "gu": fused_gu, "ly": ly}
    t_fused = timeit(lambda: run_fused(params, extra, x0))
    log(f"megacall qkv+gu (5 calls/layer):  {t_fused*1e3:.2f} ms/step "
        f"(gu bn limited by 37888=2^10*37)")
    extra_p = {"qkv": fused_qkv, "gu": fused_gu_pad, "ly": ly}
    t_fused_p = timeit(lambda: run_fused(params, extra_p, x0))
    log(f"megacall, gu padded to 39424:     {t_fused_p*1e3:.2f} ms/step")
    best = min(t_fused, t_fused_p)
    log(f"delta vs split: {(t_split-best)*1e3:+.2f} ms "
        f"({'ADOPT' if t_split - best >= 1e-3 else 'documented negative'}"
        f" per VERDICT r2 #8 bar of >=1 ms)")


if __name__ == "__main__":
    main()
