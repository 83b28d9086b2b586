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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
