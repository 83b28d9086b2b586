"""Weight-only quantization: INT8 per-channel and INT4 group-wise packing.

The reference engine is pure bf16 (its weights.bin pipeline,
layers/src/tensor_parser.cpp + iengine.cu:117-223, streams bf16 bytes);
INT8/INT4 weight-only quant with fused dequant-matmul is the baseline's
north-star addition.  This module is the offline packer; the runtime side
is ops/linear.py (XLA fallback) and ops/quant_matmul.py (Pallas kernel).

Schemes (standard weight-only recipes):
* INT8: symmetric per-output-channel absmax over the full reduction axis —
  one fp32 scale per output column.  (ppl Δ target ≤ 0.1)
* INT4: symmetric absmax per ``group_size`` slice of the reduction axis —
  scales ``[in/group, out]``, values in [-8, 7] (we use -7..7 symmetric),
  packed two logical rows per int8 byte (see ops/linear.py docstring for
  the exact nibble layout).  (ppl Δ target ≤ 0.5)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    bits: int = 8               # 4 or 8
    group_size: int = 128       # reduction-axis group (int8 uses per-channel
                                # = one group over the whole axis by default)
    quantize_lm_head: bool = False
    kv_bits: int = 16           # 8 → int8 KV cache
    pad_free: bool = False      # prefer a smaller group size over padding
                                # the reduction axis (required by the fused
                                # decode kernel, ops/fused_step.py, whose
                                # single-pass MLP needs gate/up N == down K)

    def __post_init__(self):
        assert self.bits in (4, 8), self.bits


def pad_free_group_size(k: int, group_size: int) -> int:
    """Largest gs ≤ group_size for which INT4 packing needs no K padding
    (even plane-pair count or a short tile chain — mirrors quantize_linear's
    padding rule)."""
    gs = group_size
    while gs > 2:
        if k % (2 * gs) == 0:
            kt = k // (2 * gs)
            if kt <= 20 or kt % 2 == 0:
                return gs
        gs //= 2
    return gs


def pack_int4(q: jax.Array, group_size: int) -> jax.Array:
    """Pack ``[K, N]`` int8 values in [-8,7] to ``[K//2, N]`` bytes.

    Plane layout: adjacent scale groups 2p (→ low nibbles) and 2p+1
    (→ high nibbles) share packed rows ``p*G..(p+1)*G`` — each nibble plane
    of a k-tile is one whole group.  Byte encoding ``16*hi + (lo+8)``
    (hi signed, lo excess-8), decodable with 3 int ops and exactly
    invertible in [-128, 127] (see ops/linear.py docstring).
    Requires K % (2*group_size) == 0.
    """
    k, n = q.shape[-2], q.shape[-1]
    assert k % (2 * group_size) == 0, (k, group_size)
    lead = q.shape[:-2]
    g = group_size
    qg = q.reshape(*lead, k // (2 * g), 2, g, n)
    lo = qg[..., 0, :, :].astype(jnp.int32)
    hi = qg[..., 1, :, :].astype(jnp.int32)
    packed = (hi * 16 + lo + 8).astype(jnp.int8)
    return packed.reshape(*lead, k // 2, n)


def quantize_linear(lin: Linear, bits: int, group_size: Optional[int] = None,
                    pad_free: bool = False) -> QuantLinear:
    """Quantize a bf16 Linear to a QuantLinear (weights ``[.., in, out]``).

    Works on single weights ``[K, N]`` and layer-stacked ``[L, K, N]``.
    pad_free: shrink the group size rather than pad the reduction axis.
    """
    w = lin.w.astype(jnp.float32)
    k = w.shape[-2]
    if bits == 4 and pad_free:
        group_size = pad_free_group_size(k, group_size or 128)
    if bits == 4:
        # pad the reduction axis so the kernel can halve a long, odd k-tile
        # chain (e.g. Qwen 7B down-proj: K=18944=512*37 -> 19456=1024*19).
        gs0 = group_size or 128
        kt = -(-k // (2 * gs0))
        if kt > 20 and kt % 2 == 1:
            kt += 1
        k_pad = kt * 2 * gs0
        if k_pad != k:
            w = jnp.pad(w, [(0, 0)] * (w.ndim - 2) + [(0, k_pad - k), (0, 0)])
            k = k_pad
    if bits == 8:
        gs = group_size or k  # default: per-output-channel (one group)
        qmax = 127.0
    else:
        gs = group_size or 128
        # group-pair packing needs an even group count; shrink gs to fit
        while gs > 2 and (k % gs or (k // gs) % 2):
            gs //= 2
        qmax = 7.0
    assert k % gs == 0, (k, gs)
    groups = k // gs
    lead = w.shape[:-2]
    n = w.shape[-1]
    wg = w.reshape(*lead, groups, gs, n)
    absmax = jnp.max(jnp.abs(wg), axis=-2)  # [..., groups, n]
    scales = absmax / qmax
    safe = jnp.where(scales > 0, scales, 1.0)
    q = jnp.clip(jnp.round(wg / safe[..., None, :]), -qmax, qmax)
    q = q.reshape(*lead, k, n).astype(jnp.int8)
    if bits == 4:
        if q.ndim == 2:
            q = pack_int4(q, gs)
        else:  # layer-stacked
            q = jax.vmap(lambda t: pack_int4(t, gs))(q)
    return QuantLinear(q=q, scales=scales.astype(jnp.float32), b=lin.b,
                       bits=bits, group_size=gs)


def quantize_params(params: dict, qcfg: QuantConfig) -> dict:
    """Quantize every projection Linear in a model param pytree.

    Norm weights, embeddings and rope tables stay bf16/fp32; lm_head is
    quantized only if ``qcfg.quantize_lm_head`` (it dominates decode FLOPs
    at small models but is accuracy-sensitive).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name, leaf in list(layers.items()):
        if name == "router":
            continue  # tiny, accuracy-critical (MoE top-k selection)
        if name in ("moe_gate", "moe_up", "moe_down"):
            # expert stacks [L, E, K, N] — for Qwen3-MoE the experts ARE
            # the model (30B-A3B: ~29B of 30.5B params), so they get the
            # same group-wise treatment as dense projections; the runtime
            # side is ops/grouped_matmul.py (quantize_linear's lead-dims
            # handling covers the extra expert axis)
            layers[name] = quantize_linear(Linear(w=leaf), qcfg.bits,
                                           qcfg.group_size,
                                           pad_free=qcfg.pad_free)
        elif isinstance(leaf, Linear):
            layers[name] = quantize_linear(leaf, qcfg.bits, qcfg.group_size,
                                           pad_free=qcfg.pad_free)
    out["layers"] = layers
    if qcfg.quantize_lm_head and isinstance(out.get("lm_head"), Linear):
        out["lm_head"] = quantize_linear(out["lm_head"], qcfg.bits,
                                         qcfg.group_size,
                                         pad_free=qcfg.pad_free)
    return out


def fuse_projections(params: dict) -> dict:
    """Concatenate q/k/v -> one ``qkv`` projection and gate/up -> one
    ``gateup`` (output-axis concat of packed weights, scales and biases).

    Halves the per-layer Pallas call count on the decode hot path (each
    call costs ~10 us of fixed dispatch+pipeline-warmup on v5e — measured
    via the fused-MLP ablation, docs/PERF.md). Requires equal group sizes
    per fused pair. NOTE: fused qkv interleaves q- and kv-head columns, so
    the tensor-parallel shard_map path declines these params
    (parallel/tp_step.supports_tp) — keep split projections for TP.
    """
    layers = dict(params["layers"])

    def cat(names, out_name):
        lins = [layers[n] for n in names]
        if not all(isinstance(l, QuantLinear) for l in lins):
            return
        gs = {l.group_size for l in lins}
        bits = {l.bits for l in lins}
        kin = {l.q.shape[-2] for l in lins}
        if len(gs) > 1 or len(bits) > 1 or len(kin) > 1:
            return
        b = None
        if any(l.b is not None for l in lins):
            if not all(l.b is not None for l in lins):
                return
            b = jnp.concatenate([l.b for l in lins], axis=-1)
        fused = QuantLinear(
            q=jnp.concatenate([l.q for l in lins], axis=-1),
            scales=jnp.concatenate([l.scales for l in lins], axis=-1),
            b=b, bits=lins[0].bits, group_size=lins[0].group_size,
        )
        for n in names:
            del layers[n]
        layers[out_name] = fused

    cat(("q", "k", "v"), "qkv")
    cat(("gate", "up"), "gateup")
    return dict(params, layers=layers)
