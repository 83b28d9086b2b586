"""2-process jax.distributed test: DCN×ICI mesh on CPU.

Spawns two worker processes, each with 4 virtual CPU devices, joined via
``jax.distributed`` (parallel/mesh.initialize_multihost). The (2, 4)
mesh's ``data`` axis crosses the process boundary — the CPU stand-in for
a 2-host TPU slice's DCN axis — while ``model`` (TP, shard_map psums)
stays inside each process, mirroring SURVEY §2c's multi-host layout.
Both workers must produce the same replicated checksum, and it must match
the single-process 8-device run of the identical program.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(root, worker):
    """One coordinated 2-worker run; returns the two stdouts or raises."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
                q.communicate()
            raise
        if p.returncode != 0 and "already in use" in (err or "").lower():
            for q in procs:
                q.kill()
                q.communicate()
            raise _PortCollision(err[-500:])
        assert p.returncode == 0, f"proc{i} failed:\n{out}\n{err[-3000:]}"
        outs.append(out)
    return outs


class _PortCollision(RuntimeError):
    """The probe-then-bind window of _free_port lost a race with another
    process; retrying with a fresh port is collision handling, not a
    flaky-failure mask (all other failures propagate on first strike)."""


def test_two_process_distributed_matches_single_process(devices8):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    try:
        outs = _spawn_workers(root, worker)
    except _PortCollision:
        outs = _spawn_workers(root, worker)

    sums = []
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if "checksum=" in ln]
        assert line, f"proc{i} printed no checksum: {out}"
        assert f"devices=8" in line[0] and "local=4" in line[0], line[0]
        # Gloo writes progress messages to the same fd concurrently with the
        # worker's print, so the checksum may have trailing garbage ON THE
        # SAME LINE (the historical "flake" was float() choking on it) —
        # extract just the leading numeric token
        m = re.match(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?",
                     line[0].split("checksum=")[1])
        assert m, line[0]
        sums.append(float(m.group(0)))
    assert sums[0] == pytest.approx(sums[1], rel=1e-6)

    # single-process baseline on the in-process 8-device mesh
    from tests.multihost_common import checksum_tp_step

    expected = checksum_tp_step()
    assert sums[0] == pytest.approx(expected, rel=1e-4)
