"""Device-mesh construction for single-host and multi-host TPU slices.

The communication layer the reference never had (SURVEY.md §2c: no NCCL, no
MPI, no multi-GPU — one process, one device).  On TPU the transport is ICI
within a slice and DCN across hosts; both are reached through a
``jax.sharding.Mesh`` whose axes carry the parallelism meaning:

* ``data``  — batch (DP): independent sequences, no per-step collectives;
* ``model`` — tensor parallel (TP): weights/KV-heads sharded, XLA inserts
  all-reduce (psum) after o_proj/down_proj reductions, riding ICI.

``jax.make_mesh`` orders physical devices so the innermost (last) mesh axis
maps to the fastest interconnect ring — keep ``model`` last so TP
collectives ride ICI, while ``data`` may span DCN on multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    Default: all devices on the model axis (pure TP — the usual serving
    layout inside one slice). shape=(d, m) must satisfy d*m == #devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    d, m = shape
    assert d * m == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, tuple(axis_names))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host slice.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere.  After this, ``jax.devices()`` spans all
    hosts and the same ``make_mesh`` call on every host yields the global
    mesh (DCN axis outermost automatically via device order).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
