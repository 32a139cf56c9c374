"""Utilities: profiling/tracing hooks and debug helpers."""

from .debug import assert_finite, debug_nans, tree_finite_report
from .profiling import StepTimer, named_scope, trace

__all__ = [
    "assert_finite",
    "debug_nans",
    "tree_finite_report",
    "StepTimer",
    "named_scope",
    "trace",
]
