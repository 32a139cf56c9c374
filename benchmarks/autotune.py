#!/usr/bin/env python3
"""Repo wrapper for the packaged batch-tile autotuner (aecf_tpu.tune).

The tuner itself ships in the package — deployed users run
``python -m aecf_tpu.tune``.  This wrapper exists so development runs hit
the repo's warmed compile cache (``.jax_cache/``, exported through
``AECF_CACHE_DIR`` so the tuner's own cache setup resolves to it) instead
of a cold user cache.  All tuner logic, flags, and output live in
:mod:`aecf_tpu.tune`.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _ROOT)

from aecf_tpu.tune import (  # noqa: E402,F401 — re-export for tests/tools
    _build,
    _sites_for,
    _sweep_kind,
    candidate_tiles,
    main,
    pick_winner,
)


if __name__ == "__main__":
    os.environ.setdefault(
        "AECF_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
    )
    main()
