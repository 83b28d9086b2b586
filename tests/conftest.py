"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU analogue of a "fake backend" for distributed tests (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives eight CPU devices so mesh /
sharding / collective code paths execute for real without TPU hardware.
Pallas kernels are tested in interpreter mode on CPU; compiled-kernel
correctness and perf run on the real chip via bench.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: (a) reruns skip most of the ~40 min of
# XLA:CPU compiles, (b) fewer in-process backend_compile calls — the
# long-suite XLA:CPU compiler segfault (observed 3x at the ~90% mark,
# always inside backend_compile_and_load; each crashing test passes in a
# fresh process) has fewer chances to fire.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the in-process XLA:CPU compiler state: the long suite
    accumulates hundreds of compiled programs and the CPU compiler has
    segfaulted (upstream, inside backend_compile_and_load) at the ~90%
    mark on several runs while every crashing test passes in a fresh
    process. Dropping jit caches between modules keeps the compiler's
    working set (and any corrupted state) from accumulating; the
    persistent on-disk cache makes re-compiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
