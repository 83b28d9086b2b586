"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process owns 4 virtual CPU devices; the (2, 4) mesh therefore spans
the process boundary on the `data` axis (the DCN axis on a real 2-host
slice) with `model` inside each process (the ICI axis). The whole model
runs inside one jit so every array is created with global SPMD semantics;
the printed checksum must agree across processes and with the
single-process run.

Usage: python tests/multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    from qwen_inference_engine_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from tests.multihost_common import checksum_tp_step

    value = checksum_tp_step()
    print(f"proc{pid} devices={len(jax.devices())} "
          f"local={len(jax.local_devices())} checksum={value:.6f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
