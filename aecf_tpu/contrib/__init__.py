"""Interop wrappers for third-party module systems (flax linen)."""
