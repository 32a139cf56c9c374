"""Test harness configuration.

Forces an 8-virtual-device CPU backend (the standard JAX fake-backend trick)
so sharding/multi-chip tests run anywhere, per SURVEY.md §4(c).  Set
``AECF_TEST_REAL_DEVICES=1`` to run the suite against whatever backend is
live (e.g. a real TPU) instead.

Must run before anything imports jax, hence the env mutation at module top.
"""

import os

_FORCE_CPU = not os.environ.get("AECF_TEST_REAL_DEVICES")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Hermeticity: a user/autotuner tile table must never alter kernel launch
# tiles during tests (tolerances pin semantics, and test_tiles.py asserts
# exact default picks) — unconditional assignment, so an exported
# AECF_TILE_TABLE in the developer's shell can't leak in either.  Tests
# that exercise the table point this at a tmp_path file instead.
os.environ["AECF_TILE_TABLE"] = os.path.join(
    os.path.dirname(__file__), ".no-tile-table.json"
)

import jax
import numpy as np
import pytest

if _FORCE_CPU:
    # The axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
    # the config knob is honored.
    jax.config.update("jax_platforms", "cpu")
else:
    # Running the suite against real hardware: hold matmuls to f32 passes.
    # TPU's default bf16 multiplies would blow the suite's 1e-5/1e-6
    # tolerances, which pin semantics, not hardware precision.
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: this box has 1 vCPU and XLA compiles dominate
# test wall-clock; cache compiled executables across pytest runs.  Derived
# from this file's location so checkouts elsewhere keep their cache local.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
