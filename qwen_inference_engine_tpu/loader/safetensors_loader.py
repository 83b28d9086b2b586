"""Sharded safetensors checkpoint reader.

TPU-native replacement for the reference's weight pipeline
(reference: layers/src/tensor_parser.cpp:31-129 — 8-byte header-length +
JSON header parse per shard, offsets rebased into one global address space;
layers/src/iengine.cu:117-223 — 2 GiB-chunked upload of a concatenated
``weights.bin`` into a single resident device buffer).

Design differences, deliberate:
* no ``weights.bin`` concatenation step — tensors are ``np.memmap``-viewed
  directly out of each ``model-XXXXX-of-YYYYY.safetensors`` shard
  (zero-copy on the host) and ``jax.device_put`` to their target sharding,
  so a weight never exists host-resident more than one tensor at a time;
* instead of one flat device buffer + byte-offset pointer views
  (helpers.cuh:17-35), placement is a pytree of device arrays with
  NamedShardings — XLA manages residency and layout per tensor.

A C++ fast path for header indexing + int4 repacking lives in native/
(ctypes-loaded, optional); this pure-Python path is always available.
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_inference_engine_tpu.config import ModelConfig
from qwen_inference_engine_tpu.loader.convert import params_from_state_dict

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled via uint16 view + ml_dtypes
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


@dataclasses.dataclass
class TensorEntry:
    """One tensor record from a safetensors JSON header (the analogue of the
    reference's ``tensor`` struct, layers/include/tensor_parser.hh:35-52)."""

    name: str
    dtype: str
    shape: Tuple[int, ...]
    start: int  # byte offset within the shard's data section
    end: int
    file: str


def parse_safetensors_header(path: str) -> Tuple[List[TensorEntry], int]:
    """Parse one shard's header. Returns (entries, data_section_offset)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
    data_off = 8 + header_len
    entries = []
    for name, rec in header.items():
        if name == "__metadata__":
            continue
        s, e = rec["data_offsets"]
        entries.append(
            TensorEntry(name, rec["dtype"], tuple(rec["shape"]), s, e, path)
        )
    return entries, data_off


class SafetensorsIndex:
    """Name → (shard file, offsets) index over a sharded HF checkpoint dir."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        self.entries: Dict[str, TensorEntry] = {}
        self._data_off: Dict[str, int] = {}
        self._mmaps: Dict[str, np.memmap] = {}
        files = self._shard_files(ckpt_dir)
        if not files:
            raise FileNotFoundError(f"no .safetensors shards under {ckpt_dir}")
        for path in files:
            entries, data_off = parse_safetensors_header(path)
            self._data_off[path] = data_off
            for e in entries:
                self.entries[e.name] = e

    @staticmethod
    def _shard_files(ckpt_dir: str) -> List[str]:
        idx_path = os.path.join(ckpt_dir, "model.safetensors.index.json")
        if os.path.exists(idx_path):
            with open(idx_path) as f:
                wm = json.load(f)["weight_map"]
            return sorted({os.path.join(ckpt_dir, v) for v in wm.values()})
        return sorted(
            os.path.join(ckpt_dir, f)
            for f in os.listdir(ckpt_dir)
            if f.endswith(".safetensors")
        )

    def names(self) -> List[str]:
        return sorted(self.entries)

    def _mmap(self, path: str) -> np.memmap:
        if path not in self._mmaps:
            self._mmaps[path] = np.memmap(path, dtype=np.uint8, mode="r")
        return self._mmaps[path]

    def read(self, name: str) -> np.ndarray:
        """Zero-copy memmap view of a tensor (bf16 via ml_dtypes view)."""
        e = self.entries[name]
        mm = self._mmap(e.file)
        base = self._data_off[e.file]
        raw = mm[base + e.start : base + e.end]
        if e.dtype == "BF16":
            arr = raw.view(np.uint16).view(jnp.dtype(jnp.bfloat16))
        else:
            np_dt = _DTYPES[e.dtype]
            if np_dt is None:
                raise ValueError(f"unsupported dtype {e.dtype}")
            arr = raw.view(np_dt)
        return arr.reshape(e.shape)

    def close(self):
        self._mmaps.clear()


def load_checkpoint(
    ckpt_dir: str,
    cfg: Optional[ModelConfig] = None,
    dtype=jnp.bfloat16,
    sharding_fn: Optional[Callable[[str, tuple], object]] = None,
) -> Tuple[ModelConfig, dict]:
    """Load an HF Qwen checkpoint directory into a model param pytree.

    sharding_fn(path_hint, shape) -> jax.sharding.Sharding | None decides
    placement per tensor (parallel/sharding.py provides the TP rules);
    None → default device placement.
    """
    if cfg is None:
        cfg = ModelConfig.from_json(os.path.join(ckpt_dir, "config.json"),
                                    name=os.path.basename(ckpt_dir))
    index = SafetensorsIndex(ckpt_dir)

    def put(arr):
        if sharding_fn is None:
            return jnp.asarray(arr)
        return arr  # placement handled after name mapping (engine-side)

    params = params_from_state_dict(cfg, index.read, dtype=dtype, device_put=put)
    if sharding_fn is not None:
        from qwen_inference_engine_tpu.parallel.sharding import shard_params_with_fn

        params = shard_params_with_fn(params, sharding_fn)
    index.close()
    return cfg, params
