"""Interop wrappers for third-party module systems (flax linen, dm-haiku)
and torch checkpoints."""
