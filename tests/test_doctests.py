"""Runnable doctest examples (reference parity: AECFLayer.py carries inline
doctest-style examples at :65-69, :357-368, :615-624, :688-698 — ours are
executable and checked here)."""

import doctest

import aecf_tpu.nn.functional
import aecf_tpu.nn.modules


def _run(module):
    results = doctest.testmod(module, verbose=False)
    assert results.attempted > 0, f"no doctests found in {module.__name__}"
    assert results.failed == 0, f"{results.failed} doctest failures"


def test_functional_doctests():
    _run(aecf_tpu.nn.functional)


def test_modules_doctests():
    _run(aecf_tpu.nn.modules)
