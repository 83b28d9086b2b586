"""Linear layers: bf16 and weight-only-quantized (INT8 / INT4).

TPU-native replacement for the reference's WMMA bf16 GEMM
(reference: layers/src/matrix_mul.cu:165-288, launched via
layers/include/helpers.cuh:81-106).  The reference computes
``C[M,Kout] = A[M,N] . B[Kout,N]^T`` against HF row-major ``[out,in]``
weights; we instead store weights pre-transposed ``[in,out]`` so every
projection is a plain ``jnp.dot`` that XLA tiles directly onto the MXU —
no transpose, no hand scheduling.

Quantized weights (INT8 per-output-channel, INT4 group-wise — the baseline's
north-star kernels, absent from the pure-bf16 reference) are stored packed;
the matmul dispatches to a Pallas fused dequant-matmul kernel on TPU with a
pure-XLA fallback elsewhere.

INT4 packing layout (plane packing): scale groups along the reduction
axis are packed in adjacent pairs — packed byte row ``p*G + r`` holds
logical row ``p*2G + r`` (group ``2p``, LOW nibble) and ``p*2G + G + r``
(group ``2p+1``, HIGH nibble), with byte encoding
``byte = 16*hi + (lo+8)`` (hi two's-complement, lo excess-8; byte range
exactly [-128, 127]).  Chosen for the TPU kernel (ops/quant_matmul.py):
(a) each nibble plane of a packed k-tile is exactly ONE whole scale
    group, so the two mixed-input MXU dots per tile need no shuffles and
    the group scale multiplies the tiny [M, bn] partial AFTER the dot;
(b) unpack is 3 int ops on the bytes: ``lo+8 = byte & 0xF`` and
    ``hi = (byte - (byte & 0xF)) >> 4`` (arithmetic shift, sign-exact);
(c) the lo plane's +8 offset folds into an O(M) post-dot correction
    ``- 8 * rowsum(x_even) * scale`` instead of per-value arithmetic.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w", "b"],
    meta_fields=[],
)
@dataclasses.dataclass
class Linear:
    """Dense weight ``[in, out]`` (+ optional bias) in bf16/fp32."""

    w: jax.Array
    b: Optional[jax.Array] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales", "b"],
    meta_fields=["bits", "group_size"],
)
@dataclasses.dataclass
class QuantLinear:
    """Weight-only quantized dense layer.

    q: int8. For bits=8: ``[in, out]`` values in [-127,127].
       For bits=4: ``[in//2, out]`` packed nibbles (see module docstring),
       logical values in [-8,7].
    scales: ``[in//group_size, out]`` float32 dequant scales.
    """

    q: jax.Array
    scales: jax.Array
    b: Optional[jax.Array]
    bits: int
    group_size: int

    @property
    def in_features(self) -> int:
        k = self.q.shape[-2]
        return k * 2 if self.bits == 4 else k

    @property
    def out_features(self) -> int:
        return self.q.shape[-1]


def unpack_nibbles(packed: jax.Array):
    """(low, high) signed int4 planes of ``byte = 16*hi + (lo+8)``.

    Mosaic/TPU has no sub-32-bit vector shifts; decode in i32."""
    p32 = packed.astype(jnp.int32)
    l8 = jnp.bitwise_and(p32, 0xF)
    lo = l8 - 8
    hi = jnp.right_shift(p32 - l8, 4)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def unpack_int4(packed: jax.Array, group_size: int) -> jax.Array:
    """Unpack ``[K//2, N]`` int8 nibbles to ``[K, N]`` int8 in [-8, 7].

    Inverse of quant.pack_int4 (group-pair layout, see module docstring).
    """
    kh, n = packed.shape[-2], packed.shape[-1]
    g = group_size
    lo, hi = unpack_nibbles(packed)
    lead = packed.shape[:-2]
    lo = lo.reshape(*lead, kh // g, 1, g, n)
    hi = hi.reshape(*lead, kh // g, 1, g, n)
    out = jnp.concatenate([lo, hi], axis=-3)  # [..., pairs, 2, g, n]
    return out.reshape(*lead, kh * 2, n)


def dequantize(lin: QuantLinear) -> jax.Array:
    """Materialize the bf16 weight ``[in, out]`` (testing / XLA fallback)."""
    if lin.bits == 8:
        q = lin.q
    elif lin.bits == 4:
        q = unpack_int4(lin.q, lin.group_size)
    else:
        raise ValueError(f"bits={lin.bits}")
    k, n = q.shape[-2], q.shape[-1]
    groups = lin.scales.shape[-2]
    lead = q.shape[:-2]
    qg = q.reshape(*lead, groups, k // groups, n).astype(jnp.float32)
    w = qg * lin.scales[..., :, None, :]
    return w.reshape(*lead, k, n).astype(jnp.bfloat16)


def _quant_matmul_xla(x: jax.Array, lin: QuantLinear,
                      act_bits: int = 0) -> jax.Array:
    """Pure-XLA fused dequant matmul.

    Contracts per group so XLA fuses the int→float cast and scale into the
    reduction without materializing the bf16 weight in HBM:
    ``y = sum_g (x_g @ q_g) * s_g`` with the scale applied per-group.

    ``act_bits=8`` applies the same per-token activation quantization as
    the Pallas W4A8/W8A8 kernels (ops/quant_matmul.py), so accuracy gates
    for activation quant run on any backend with kernel-equivalent
    numerics (int products are exact in f32 up to 2^24).
    """
    if lin.bits == 8:
        q = lin.q
    else:
        q = unpack_int4(lin.q, lin.group_size)
    k, n = q.shape
    groups = lin.scales.shape[0]
    gs = k // groups
    lead = x.shape[:-1]
    if x.shape[-1] < k:  # quantizer-padded reduction axis (see quantize.py)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k - x.shape[-1])])
    out_dtype = x.dtype
    sx = None
    if act_bits == 8:
        from qwen_inference_engine_tpu.ops.quant_matmul import (
            quantize_activations,
        )

        x, sx = quantize_activations(x)
    xg = x.reshape(-1, groups, gs).astype(jnp.float32)
    qg = q.reshape(groups, gs, n).astype(jnp.float32)
    # fold scales into the weight operand; XLA fuses the multiply into the
    # contraction so no [m, groups, n] intermediate is materialized.
    wg = qg * lin.scales[:, None, :]
    y = jnp.einsum("mgk,gkn->mn", xg, wg, preferred_element_type=jnp.float32)
    if sx is not None:
        y = y * sx.reshape(-1, 1)
    return y.reshape(*lead, n).astype(out_dtype)


def apply_linear(x: jax.Array, lin, use_pallas: bool = True,
                 layer=None, act_bits: int = 0) -> jax.Array:
    """``x [..., in] @ lin -> [..., out]`` for Linear or QuantLinear.

    For a layer-STACKED QuantLinear (q ``[L, K/pack, N]``) pass ``layer``
    (traced scalar): the Pallas kernel indexes the stacked weights directly
    (no dynamic-slice copy inside a layer scan).

    ``act_bits=8`` (QuantLinear only) quantizes activations per token and
    runs integer MXU dots — W4A8/W8A8, see ops/quant_matmul.py.  Ignored
    for bf16 ``Linear`` layers."""
    stacked = layer is not None
    if isinstance(lin, Linear):
        w = lin.w[layer] if stacked else lin.w
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y.astype(x.dtype)
    elif isinstance(lin, QuantLinear):
        if use_pallas and _pallas_available():
            from qwen_inference_engine_tpu.ops.quant_matmul import quant_matmul_pallas

            y = quant_matmul_pallas(x, lin, layer=layer, act_bits=act_bits)
        else:
            lin2 = lin
            if stacked:
                import dataclasses as _dc

                lin2 = _dc.replace(lin, q=lin.q[layer],
                                   scales=lin.scales[layer], b=None)
            y = _quant_matmul_xla(x, lin2, act_bits=act_bits)
    else:
        raise TypeError(f"not a linear: {type(lin)}")
    if lin.b is not None:
        b = lin.b[layer] if stacked else lin.b
        y = y + b.astype(y.dtype)
    return y


def _pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
