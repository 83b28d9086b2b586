"""Shared test utilities."""

import contextlib
from unittest import mock


@contextlib.contextmanager
def interpret_pallas(module):
    """Run a module's pallas_call in interpreter mode (CPU kernel tests)."""
    orig = module.pl.pallas_call

    def call(*a, **k):
        k.pop("compiler_params", None)
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(module.pl, "pallas_call", call):
        yield
