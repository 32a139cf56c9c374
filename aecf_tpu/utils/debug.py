"""Numerical-safety debug tooling (SURVEY.md §5 "race detection/sanitizers"
row: the reference's safety layer is numerical — NaN scrubbing, clamps,
renorm fallbacks; this module adds the debug-mode guards on top).
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp

__all__ = ["debug_nans", "assert_finite", "tree_finite_report"]


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped ``jax_debug_nans``: any NaN produced under jit raises with the
    offending primitive's location."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finiteness check over a pytree (blocks on values)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {', '.join(bad)}"
        )


def tree_finite_report(tree: Any) -> dict:
    """Per-leaf {path: (finite_fraction, max_abs)} summary for debugging."""
    report = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            report[jax.tree_util.keystr(path)] = (
                float(jnp.isfinite(leaf).mean()),
                float(jnp.abs(jnp.nan_to_num(leaf)).max()),
            )
    return report
