"""ctypes bindings for the native host helpers (native/csrc/qie_native.cpp).

Everything has a pure-numpy fallback so the library is optional; when
``libqie_native.so`` is present (``make -C native``), checkpoint transpose
and shard reads run multithreaded in C++ — the TPU build's counterpart of
the reference's C++ weight pipeline (tensor_parser.cpp + the chunked
uploader in iengine.cu:117-223).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    candidates = [
        os.environ.get("QIE_NATIVE_LIB", ""),
        os.path.join(_repo_root(), "native", "libqie_native.so"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.qie_transpose_2d.restype = ctypes.c_int
                lib.qie_transpose_2d.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ]
                lib.qie_read_file_range.restype = ctypes.c_int64
                lib.qie_read_file_range.argtypes = [
                    ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
                    ctypes.c_void_p, ctypes.c_int,
                ]
                lib.qie_bf16_to_f32.restype = None
                lib.qie_bf16_to_f32.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def transpose_2d(src: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Materialized transpose of a 2-D array (C++ blocked+threaded when
    available, numpy ascontiguousarray otherwise)."""
    assert src.ndim == 2
    lib = _load()
    if lib is None or src.dtype.itemsize not in (1, 2, 4, 8):
        return np.ascontiguousarray(src.T)
    src = np.ascontiguousarray(src)
    dst = np.empty((src.shape[1], src.shape[0]), dtype=src.dtype)
    rc = lib.qie_transpose_2d(
        src.ctypes.data_as(ctypes.c_void_p), dst.ctypes.data_as(ctypes.c_void_p),
        src.shape[0], src.shape[1], src.dtype.itemsize, nthreads,
    )
    if rc != 0:
        return np.ascontiguousarray(src.T)
    return dst


def read_file_range(path: str, offset: int, size: int, nthreads: int = 0) -> np.ndarray:
    """Read ``size`` bytes at ``offset`` (threaded pread when available)."""
    lib = _load()
    if lib is None:
        with open(path, "rb") as f:
            f.seek(offset)
            return np.frombuffer(f.read(size), dtype=np.uint8)
    buf = np.empty(size, dtype=np.uint8)
    got = lib.qie_read_file_range(
        path.encode(), offset, size, buf.ctypes.data_as(ctypes.c_void_p), nthreads
    )
    if got != size:
        raise IOError(f"short read {got} != {size} from {path}@{offset}")
    return buf


def bf16_to_f32(src_u16: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Widen a uint16-viewed bf16 buffer to float32."""
    lib = _load()
    if lib is None:
        return (src_u16.astype(np.uint32) << 16).view(np.float32)
    src_u16 = np.ascontiguousarray(src_u16)
    dst = np.empty(src_u16.shape, dtype=np.float32)
    lib.qie_bf16_to_f32(
        src_u16.ctypes.data_as(ctypes.c_void_p), dst.ctypes.data_as(ctypes.c_void_p),
        src_u16.size, nthreads,
    )
    return dst
