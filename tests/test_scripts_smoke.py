"""CPU smoke runs of the TPU measurement scripts.

These exist so signature drift between ``scripts/`` harnesses and the
scheduler's compiled entry points (``_jit_decode`` / ``_jit_verify``)
fails CI instead of surfacing as a TypeError during a scarce TPU
window (round-3 advisor finding on scripts/ablate_verify.py:104).
"""

import os
import runpy
import sys

import pytest


def _run_script(monkeypatch, path, argv, env=None):
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    monkeypatch.setattr(sys, "argv", [path] + argv)
    runpy.run_path(path, run_name="__main__")


def test_ablate_verify_signatures(monkeypatch):
    """ablate_verify must call the scheduler's own jits with the live
    signatures (incl. the trailing `active` mask)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _run_script(
        monkeypatch,
        os.path.join(root, "scripts", "ablate_verify.py"),
        ["tiny", "4", "48"],
        env={"QIE_ABLATE_SMOKE": "1"},
    )
