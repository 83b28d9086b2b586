"""Native C++ helper tests (builds native/libqie_native.so via make if a
compiler is present; all helpers also have numpy fallbacks that these tests
cover when the build is unavailable)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

import qwen_inference_engine_tpu.loader.native as native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    so = os.path.join(REPO, "native", "libqie_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            pass
    # reset the lazy loader so it can pick up a fresh build
    native._TRIED = False
    native._LIB = None
    yield


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32, np.int64])
def test_transpose_matches_numpy(dtype):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 100, size=(257, 129)).astype(dtype)
    got = native.transpose_2d(a)
    np.testing.assert_array_equal(got, a.T)


def test_bf16_widen_bit_exact():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 65536, size=10_000).astype(np.uint16)
    got = native.bf16_to_f32(u)
    expect = (u.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(got.view(np.uint32), expect.view(np.uint32))


def test_read_file_range():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=100_000).astype(np.uint8)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(data.tobytes())
        path = f.name
    try:
        got = native.read_file_range(path, 123, 50_000)
        np.testing.assert_array_equal(got, data[123:50_123])
    finally:
        os.unlink(path)
