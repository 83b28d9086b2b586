"""Offline quantized checkpoints: pack once, reload without requantizing.

The reference's analogue is its one-shot safetensors -> ``weights.bin``
concatenation (reference: layers/src/tensor_parser.cpp:48-49,118-121,
commented out) plus the byte-offset table it parses at startup. Here the
packed INT4/INT8 tensors (and everything else in the param pytree) are
written as one ``.npy`` per leaf with a JSON manifest holding the tree
structure, dtypes, and quantization metadata — mmap-friendly, no monolithic
blob, and the load path is a straight ``np.load`` + ``device_put`` per leaf
(optionally sharded).

Layout::

    qckpt/
      manifest.json     # config + leaf index (path -> file, meta)
      <leaf-path>.npy   # one array per pytree leaf
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import ml_dtypes

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.ops.linear import Linear, QuantLinear

_FORMAT_VERSION = 1
_BF16 = np.dtype(ml_dtypes.bfloat16)


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def save_quantized(ckpt_dir: str, cfg: ModelConfig, params: dict) -> None:
    """Write a (possibly quantized) param pytree as a reloadable checkpoint."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = {}
    quant_meta = {}

    def record_quant(prefix: str, leaf):
        if isinstance(leaf, QuantLinear):
            quant_meta[prefix] = {"bits": leaf.bits, "group_size": leaf.group_size}

    for name, leaf in params["layers"].items():
        record_quant(f"layers.{name}", leaf)
    if "lm_head" in params:
        record_quant("lm_head", params["lm_head"])

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    for path, arr in flat:
        name = _leaf_name(path)
        fn = name + ".npy"
        a = np.asarray(arr)
        dtype_name = str(a.dtype)
        if a.dtype == _BF16:  # np.save has no native bfloat16: store bits
            a = a.view(np.uint16)
        np.save(os.path.join(ckpt_dir, fn), a)
        leaves[name] = {"file": fn, "dtype": dtype_name,
                        "shape": list(a.shape)}

    cfg_d = dataclasses.asdict(cfg)
    cfg_d["eos_token_ids"] = list(cfg_d.get("eos_token_ids", ()))
    manifest = {
        "format_version": _FORMAT_VERSION,
        "model_config": cfg_d,
        "quant": quant_meta,
        "leaves": leaves,
    }
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_quantized(
    ckpt_dir: str,
    device_put: Optional[Callable] = None,
) -> Tuple[ModelConfig, dict]:
    """Load a checkpoint written by :func:`save_quantized`."""
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["format_version"] == _FORMAT_VERSION
    cfg_d = {k: v for k, v in manifest["model_config"].items()
             if k in ModelConfig.__dataclass_fields__}
    if "eos_token_ids" in cfg_d:
        cfg_d["eos_token_ids"] = tuple(cfg_d["eos_token_ids"])
    cfg = ModelConfig(**cfg_d)
    put = device_put or (lambda x: jnp.asarray(x))

    def arr(name: str):
        info = manifest["leaves"][name]
        a = np.load(os.path.join(ckpt_dir, info["file"]), mmap_mode="r")
        if info["dtype"] == "bfloat16":
            a = a.view(_BF16)
        return put(a)

    qmeta = manifest["quant"]

    def lin(prefix: str, has_bias_leaf: bool):
        if prefix in qmeta:
            return QuantLinear(
                q=arr(f"{prefix}.q"), scales=arr(f"{prefix}.scales"),
                b=arr(f"{prefix}.b") if has_bias_leaf else None,
                bits=qmeta[prefix]["bits"],
                group_size=qmeta[prefix]["group_size"],
            )
        return Linear(w=arr(f"{prefix}.w"),
                      b=arr(f"{prefix}.b") if has_bias_leaf else None)

    names = set(manifest["leaves"])
    layers = {}
    for nm in ("q", "k", "v", "o", "gate", "up", "down"):
        prefix = f"layers.{nm}"
        key = f"{prefix}.q" if prefix in qmeta else f"{prefix}.w"
        if key in names:
            layers[nm] = lin(prefix, f"{prefix}.b" in names)
    for nm in ("input_norm", "post_norm", "q_norm", "k_norm"):
        if f"layers.{nm}" in names:
            layers[nm] = arr(f"layers.{nm}")
    params = {
        "layers": layers,
        "embed": arr("embed"),
        "final_norm": arr("final_norm"),
        "rope_cos": arr("rope_cos"),
        "rope_sin": arr("rope_sin"),
    }
    if "lm_head.q" in names or "lm_head.w" in names:
        params["lm_head"] = lin("lm_head", "lm_head.b" in names)
    return cfg, params
