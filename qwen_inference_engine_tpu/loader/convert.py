"""HF checkpoint tensor-name mapping → layer-stacked param pytree.

The structural equivalent of the reference's ``build_indexed_tensors()``
(reference: layers/src/tensor_parser.cpp:132-165), which pivots dotted HF
tensor names into ``map[short_name][layer]``.  Here the pivot target is the
scan-ready pytree of models/qwen.py: each per-layer weight is stacked along
a leading layer axis, and projection matrices are transposed from HF
row-major ``[out, in]`` to matmul-ready ``[in, out]`` (the reference instead
leaves them ``[out,in]`` and makes its GEMM read B transposed,
layers/src/matrix_mul.cu:165-288).
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.ops.linear import Linear
from qwen_inference_engine_tpu.ops.rope import precompute_rope


def _to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach()
        if x.dtype.__str__() == "torch.bfloat16":
            x = x.float()
        return x.cpu().numpy()
    return np.asarray(x)


def params_from_state_dict(
    cfg: ModelConfig,
    get: Callable[[str], np.ndarray] | Mapping[str, object],
    dtype=jnp.bfloat16,
    device_put: Callable | None = None,
) -> dict:
    """Build the model param pytree from HF-named tensors.

    ``get`` is either a mapping (e.g. a torch ``state_dict()``) or a callable
    ``name -> array`` (e.g. a lazy safetensors reader).  ``device_put``, if
    given, is applied leaf-by-leaf (the sharded loader passes a
    NamedSharding-aware placement fn so each weight goes straight to its
    shards without a host-resident full copy).
    """
    if not callable(get):
        mapping = get
        get = lambda name: mapping[name]  # noqa: E731

    def fetch(name: str) -> np.ndarray:
        return _to_np(get(name))

    put = device_put or (lambda x: jnp.asarray(x))

    from qwen_inference_engine_tpu.loader import native

    def _t(m: np.ndarray) -> np.ndarray:
        # materialized transpose: threaded C++ when libqie_native is built
        if m.ndim == 2 and m.dtype.itemsize in (1, 2, 4, 8):
            return native.transpose_2d(m)
        return np.ascontiguousarray(m.T)

    def stack(fmt: str, transpose: bool = False):
        mats = []
        for i in range(cfg.num_layers):
            m = fetch(fmt.format(i=i))
            mats.append(_t(m) if transpose else m)
        arr = np.stack(mats).astype(_np_dtype(dtype))
        return put(arr)

    def stack_linear(prefix: str, has_bias: bool) -> Linear:
        w = stack(prefix + ".weight", transpose=True)
        b = stack(prefix + ".bias") if has_bias else None
        return Linear(w, b)

    L = "model.layers.{i}."
    bias = cfg.attention_bias
    layers = {
        "input_norm": stack(L + "input_layernorm.weight"),
        "q": stack_linear(L + "self_attn.q_proj", bias),
        "k": stack_linear(L + "self_attn.k_proj", bias),
        "v": stack_linear(L + "self_attn.v_proj", bias),
        "o": stack_linear(L + "self_attn.o_proj", False),
        "post_norm": stack(L + "post_attention_layernorm.weight"),
    }
    if cfg.is_moe:
        # Qwen3-MoE: mlp.gate = router [E, D]; mlp.experts.{e}.*_proj
        def stack_experts(proj: str, transpose: bool):
            outer = []
            for i in range(cfg.num_layers):
                mats = [
                    _t(fetch(f"model.layers.{i}.mlp.experts.{e}.{proj}.weight"))
                    if transpose else
                    fetch(f"model.layers.{i}.mlp.experts.{e}.{proj}.weight")
                    for e in range(cfg.num_experts)
                ]
                outer.append(np.stack(mats))
            return put(np.stack(outer).astype(_np_dtype(dtype)))

        layers["router"] = Linear(stack(L + "mlp.gate.weight", transpose=True))
        layers["moe_gate"] = stack_experts("gate_proj", transpose=True)
        layers["moe_up"] = stack_experts("up_proj", transpose=True)
        layers["moe_down"] = stack_experts("down_proj", transpose=True)
    else:
        layers["gate"] = stack_linear(L + "mlp.gate_proj", False)
        layers["up"] = stack_linear(L + "mlp.up_proj", False)
        layers["down"] = stack_linear(L + "mlp.down_proj", False)
    if cfg.qk_norm:
        layers["q_norm"] = stack(L + "self_attn.q_norm.weight")
        layers["k_norm"] = stack(L + "self_attn.k_norm.weight")

    cos, sin = precompute_rope(cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta)
    params = {
        "embed": put(fetch("model.embed_tokens.weight").astype(_np_dtype(dtype))),
        "layers": layers,
        "final_norm": put(fetch("model.norm.weight").astype(_np_dtype(dtype))),
        "rope_cos": cos,
        "rope_sin": sin,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = Linear(
            put(_t(fetch("lm_head.weight")).astype(_np_dtype(dtype)))
        )
    return params


def _np_dtype(dtype):
    # jnp.dtype resolves to an ml_dtypes-backed numpy dtype (bfloat16 included)
    return jnp.dtype(dtype)
