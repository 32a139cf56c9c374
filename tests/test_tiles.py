"""Per-device tile table (aecf_tpu.kernels.tiles) + autotuner helpers.

The table makes the v5e-measured batch-tile defaults portable: an on-device
sweep (aecf_tpu.tune, wrapped by benchmarks/autotune.py) records winners
keyed by launch site, and _pick_tile consults them between the env override
and the built-in default.  Everything here is hermetic (CPU, interpret-mode
kernels, tmp tables).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.core.init import init_attention_pool_params, init_fusion_query
from aecf_tpu.kernels import fused_fusion_pool_shared, tiles

_BENCHMARKS = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


@pytest.fixture(autouse=True)
def _clean_table_state(monkeypatch, tmp_path):
    """Every test sees an isolated, initially-empty table file and no
    leftover in-process table."""
    monkeypatch.setenv("AECF_TILE_TABLE", str(tmp_path / "tiles.json"))
    monkeypatch.delenv("AECF_FWD_TB", raising=False)
    monkeypatch.delenv("AECF_BWD_TB", raising=False)
    tiles.set_table(None)
    yield
    tiles.set_table(None)
    tiles.stop_recording()


def _autotune_mod():
    sys.path.insert(0, _BENCHMARKS)
    try:
        import autotune
    finally:
        sys.path.pop(0)
    return autotune


class TestSiteKey:
    def test_format_is_stable(self):
        # The key format is the on-disk contract between the library and
        # tables written by earlier autotune runs — lock it down.
        assert (
            tiles.site_key(
                "fwd_resident", M=3, E=512, H=1, kv_dtype="float32"
            )
            == "fwd_resident:M=3:E=512:H=1:kv=float32"
        )
        assert (
            tiles.site_key(
                "bwd_streamed", M=4, E=2048, H=2, kv_dtype="bfloat16",
                want_dkv=True,
            )
            == "bwd_streamed:M=4:E=2048:H=2:kv=bfloat16:dkv=1"
        )

    def test_dkv_distinguishes_backward_variants(self):
        k0 = tiles.site_key(
            "bwd_resident", M=3, E=512, H=1, kv_dtype="float32",
            want_dkv=False,
        )
        k1 = tiles.site_key(
            "bwd_resident", M=3, E=512, H=1, kv_dtype="float32",
            want_dkv=True,
        )
        assert k0 != k1


class TestTableIO:
    def test_missing_file_is_empty_table(self):
        assert tiles.load_table() == {}
        assert tiles.lookup("anything") is None

    def test_update_then_lookup_roundtrip(self):
        path = tiles.update_table({"a:M=3:E=512:H=1:kv=float32": 256})
        assert path == os.environ["AECF_TILE_TABLE"]
        assert tiles.lookup("a:M=3:E=512:H=1:kv=float32") == 256
        # merge keeps existing keys; value 0/None deletes
        tiles.update_table({"b": 64})
        assert tiles.lookup("a:M=3:E=512:H=1:kv=float32") == 256
        tiles.update_table({"a:M=3:E=512:H=1:kv=float32": 0})
        assert tiles.lookup("a:M=3:E=512:H=1:kv=float32") is None
        assert tiles.lookup("b") == 64

    def test_update_rejects_invalid_values(self):
        with pytest.raises(ValueError, match=">= 8"):
            tiles.update_table({"k": 4})
        with pytest.raises(ValueError, match=">= 8"):
            tiles.update_table({"k": "128"})

    def test_malformed_file_warns_and_is_ignored(self, tmp_path):
        path = os.environ["AECF_TILE_TABLE"]
        with open(path, "w") as f:
            f.write("{not json")
        with pytest.warns(UserWarning, match="unreadable"):
            assert tiles.load_table() == {}

    def test_invalid_entries_dropped_with_warning(self):
        path = os.environ["AECF_TILE_TABLE"]
        with open(path, "w") as f:
            json.dump({"good": 128, "tiny": 4, "stringy": "64",
                       "boolean": True, "unaligned": 100}, f)
        with pytest.warns(UserWarning, match="dropping invalid"):
            table = tiles.load_table()
        assert table == {"good": 128}

    def test_update_rejects_unaligned_values(self):
        # every launch path produces //8*8 tiles; the table must too
        with pytest.raises(ValueError, match="multiple of 8"):
            tiles.update_table({"k": 100})

    def test_non_object_file_warns(self):
        path = os.environ["AECF_TILE_TABLE"]
        with open(path, "w") as f:
            json.dump([1, 2, 3], f)
        with pytest.warns(UserWarning, match="not a JSON object"):
            assert tiles.load_table() == {}

    def test_default_path_is_per_device_kind(self, monkeypatch, tmp_path):
        monkeypatch.delenv("AECF_TILE_TABLE")
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
        p = tiles.table_path()
        assert p.startswith(str(tmp_path))
        base = os.path.basename(p)
        assert base.startswith("tiles_") and base.endswith(".json")
        # slug is filesystem-safe
        kind = base[len("tiles_"):-len(".json")]
        assert kind and all(c.isalnum() or c == "-" for c in kind)

    def test_set_table_invalidates_file_cache(self):
        assert tiles.lookup("k") is None  # caches the (empty) file table
        tiles.update_table({"k": 128})  # update_table also invalidates
        assert tiles.lookup("k") == 128
        tiles.set_table({"k": 64})
        assert tiles.lookup("k") == 64
        tiles.set_table(None)
        assert tiles.lookup("k") == 128


class TestPickTilePrecedence:
    """env override > table entry > built-in default, observed through the
    real launch site via the recording hook (interpret-mode forward)."""

    def _trace(self, E=64, M=3, B=16):
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        tiles.start_recording()
        out = fused_fusion_pool_shared(
            params, query, kv, training=False, interpret=True
        )
        return tiles.stop_recording(), out

    def test_default_recorded(self):
        log, _ = self._trace()
        assert log == [("fwd_resident:M=3:E=64:H=1:kv=float32", 16,
                        "default")]

    def test_table_overrides_default(self):
        key = tiles.site_key(
            "fwd_resident", M=3, E=64, H=1, kv_dtype="float32"
        )
        tiles.update_table({key: 8})
        log, out_t = self._trace()
        assert log == [(key, 8, "table")]
        # a different tile never changes results, only performance
        tiles.set_table({})
        _, out_d = self._trace()
        np.testing.assert_allclose(
            np.asarray(out_t[0]), np.asarray(out_d[0]), atol=1e-6
        )

    def test_env_overrides_table(self, monkeypatch):
        key = tiles.site_key(
            "fwd_resident", M=3, E=64, H=1, kv_dtype="float32"
        )
        tiles.set_table({key: 8})
        monkeypatch.setenv("AECF_FWD_TB", "16")
        log, _ = self._trace()
        assert log == [(key, 16, "env")]

    def test_table_entry_clamped_to_batch(self):
        key = tiles.site_key(
            "fwd_resident", M=3, E=64, H=1, kv_dtype="float32"
        )
        tiles.set_table({key: 4096})
        log, _ = self._trace(B=16)
        assert log == [(key, 16, "table")]

    def test_generic_kernel_site(self):
        # the per-row-query kernel resolves through the same mechanism,
        # under its own site name (different working set)
        from aecf_tpu.kernels import fused_fusion_pool

        E, M, B = 64, 3, 16
        params = init_attention_pool_params(jax.random.key(0), E)
        q = jax.random.normal(jax.random.key(1), (B, 1, E))
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        key = tiles.site_key(
            "fwd_generic", M=M, E=E, H=1, kv_dtype="float32"
        )
        tiles.start_recording()
        fused_fusion_pool(params, q, kv, training=False, interpret=True)
        assert tiles.stop_recording() == [(key, 16, "default")]
        tiles.set_table({key: 8})
        tiles.start_recording()
        fused_fusion_pool(params, q, kv, training=False, interpret=True)
        assert tiles.stop_recording() == [(key, 8, "table")]

    def test_recording_off_is_noop(self):
        params = init_attention_pool_params(jax.random.key(0), 64)
        query = init_fusion_query(jax.random.key(1), 64)
        kv = jax.random.normal(jax.random.key(2), (16, 3, 64))
        fused_fusion_pool_shared(
            params, query, kv, training=False, interpret=True
        )
        assert tiles.stop_recording() == []


class TestAutotuneHelpers:
    def test_repo_wrapper_reexports_package_tuner(self):
        # benchmarks/autotune.py must stay a thin alias of the packaged
        # tuner — divergent copies would tune with different rules.
        import aecf_tpu.tune as tune
        at = _autotune_mod()
        assert at.candidate_tiles is tune.candidate_tiles
        assert at.pick_winner is tune.pick_winner
        assert at.main is tune.main

    def test_module_entrypoint_help(self):
        # `python -m aecf_tpu.tune --help` is the documented deployed-user
        # entry point; it must parse args without touching any device.
        import subprocess
        proc = subprocess.run(
            [sys.executable, "-m", "aecf_tpu.tune", "--help"],
            capture_output=True, text=True, timeout=120,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert proc.returncode == 0, proc.stderr
        assert "--margin" in proc.stdout and "--dry-run" in proc.stdout

    def test_candidate_tiles_shape(self):
        at = _autotune_mod()
        cands = at.candidate_tiles(256, 4096)
        assert cands == sorted(set(cands))
        assert 256 in cands
        assert all(c % 8 == 0 and c >= 8 for c in cands)
        assert max(c for c in cands) <= 4096
        assert 128 in cands and 512 in cands  # half and double

    def test_candidate_tiles_clamps_to_batch(self):
        at = _autotune_mod()
        cands = at.candidate_tiles(512, 100)
        assert max(cands) <= 104  # round_up(100, 8)
        assert all(c >= 8 for c in cands)

    def test_pick_winner_margin(self):
        at = _autotune_mod()
        # within noise: default sticks (idempotent re-runs)
        assert at.pick_winner({256: 100.0, 512: 102.0}, 256, 0.03) == 256
        # beats the margin: winner displaces
        assert at.pick_winner({256: 100.0, 512: 110.0}, 256, 0.03) == 512
        # default failed to measure (transient flake): keep it unvetted —
        # never crown a candidate the margin rule couldn't compare
        with pytest.warns(UserWarning, match="failed to measure"):
            assert at.pick_winner({512: 90.0}, 256, 0.03) == 256
        with pytest.raises(ValueError):
            at.pick_winner({}, 256, 0.03)

    def test_pick_winner_paired_majority(self):
        at = _autotune_mod()
        medians = {256: 100.0, 512: 110.0}  # 512 clears the 3% margin
        # 512 beats 256 in 4/5 aligned rounds: crowned
        rounds = {256: [99, 101, 100, 100, 98],
                  512: [111, 100, 112, 109, 110]}
        assert at.pick_winner(medians, 256, 0.03, rounds) == 512
        # median win but only 2/5 paired wins (one huge outlier round
        # dragged the median): phase drift, default sticks
        rounds = {256: [100, 100, 100, 100, 100],
                  512: [200, 99, 110, 98, 97]}
        assert at.pick_winner(medians, 256, 0.03, rounds) == 256
        # exact tie in paired wins (even round count): not a strict
        # majority, default sticks
        rounds = {256: [100, 100, 100, 100],
                  512: [111, 99, 112, 98]}
        assert at.pick_winner(medians, 256, 0.03, rounds) == 256

    def test_sites_partition(self):
        at = _autotune_mod()
        log = [
            ("fwd_resident:M=3:E=512:H=1:kv=float32", 512, "default"),
            ("bwd_resident:M=3:E=512:H=1:kv=float32:dkv=0", 512,
             "default"),
            ("fwd_resident:M=3:E=512:H=1:kv=float32", 512, "default"),
        ]
        assert at._sites_for(log, "fwd_") == {
            "fwd_resident:M=3:E=512:H=1:kv=float32": 512
        }
        assert at._sites_for(log, "bwd_") == {
            "bwd_resident:M=3:E=512:H=1:kv=float32:dkv=0": 512
        }

    def test_step_site_partition_and_impl_flag(self):
        # --impl fused-step sweeps the one-pass kernel's AECF_STEP_TB;
        # its launch site records under the step_ prefix
        # (kernels/train_step.py site_key("step_resident", ...)).
        import subprocess
        at = _autotune_mod()
        log = [
            ("step_resident:M=3:E=512:H=1:kv=float32:dkv=0", 256,
             "default"),
            ("fwd_resident:M=3:E=512:H=1:kv=float32", 512, "default"),
        ]
        assert at._sites_for(log, "step_") == {
            "step_resident:M=3:E=512:H=1:kv=float32:dkv=0": 256
        }
        proc = subprocess.run(
            [sys.executable, "-m", "aecf_tpu.tune", "--help"],
            capture_output=True, text=True, timeout=120,
            cwd=os.path.join(os.path.dirname(__file__), ".."),
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert proc.returncode == 0, proc.stderr
        assert "fused-step" in proc.stdout
