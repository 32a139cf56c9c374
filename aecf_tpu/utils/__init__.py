"""Utilities: profiling/tracing hooks and debug helpers."""

from .profiling import StepTimer, named_scope, trace

__all__ = ["StepTimer", "named_scope", "trace"]
