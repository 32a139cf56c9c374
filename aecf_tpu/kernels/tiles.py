"""Per-device-kind tile table: measured batch-tile overrides for Pallas
launch sites.

The batch-tile defaults hard-coded in :mod:`shared_query` encode sizes
measured on TPU v5e (the development chip).  Other TPU generations have
different VMEM budgets and compute/bandwidth ratios, so those defaults may
be off there.  This module makes the defaults *portable*: a one-off
on-device sweep (``benchmarks/autotune.py``) records measured winners in a
small JSON table keyed by launch site and shape, and every launch site
consults the table at trace time.

Resolution order inside ``_pick_tile`` (shared_query.py):

1. ``AECF_FWD_TB`` / ``AECF_BWD_TB`` env override — honored verbatim
   (the sweep knob; probes limits intentionally).
2. Tile-table entry for the site key — honored verbatim modulo the batch
   clamp (entries were measured AND compiled on this device kind, so the
   VMEM heuristics don't second-guess them).
3. Built-in default + VMEM clamp + per-head rescale (v5e-measured).

Table location: ``$AECF_TILE_TABLE`` if set, else
``~/.cache/aecf_tpu/tiles_<device-kind>.json`` (device kind slugged, e.g.
``tpu-v5-lite``).  A missing file is an empty table.  Entries that fail
validation (non-integer, < 8, or off the 8-row sublane grid) are dropped
with a warning rather than crashing trace time.

Site keys include every factor the VMEM working set depends on —
site name, modality count M, embed dim E, head count H, kv storage dtype,
and (backward sites) whether the d_kv output tile is materialized — so an
entry tuned for one config never silently applies to another.  Batch size
only enters via the clamp.
"""

from __future__ import annotations

import json
import os
import re
import threading
import warnings
from typing import Dict, List, Optional, Tuple

__all__ = [
    "site_key",
    "table_path",
    "load_table",
    "lookup",
    "set_table",
    "update_table",
    "start_recording",
    "stop_recording",
]

_MIN_TILE = 8  # the (8, 128) f32 sublane tile is the smallest valid block

_lock = threading.Lock()
# None = not loaded yet; dict = loaded (possibly empty).  set_table()
# installs an explicit in-process table that shadows the file.
_file_cache: Optional[Dict[str, int]] = None
_explicit: Optional[Dict[str, int]] = None
_recording: Optional[List[Tuple[str, int, str]]] = None


def site_key(
    site: str,
    *,
    M: int,
    E: int,
    H: int,
    kv_dtype: str,
    want_dkv: Optional[bool] = None,
) -> str:
    """Canonical table key for one launch site.

    ``want_dkv`` applies to backward sites only (whether the d_kv output
    tile is materialized — it doubles the tile residency); forward sites
    leave it ``None`` and the field is omitted.
    """
    key = f"{site}:M={M}:E={E}:H={H}:kv={kv_dtype}"
    if want_dkv is not None:
        key += f":dkv={int(want_dkv)}"
    return key


def _device_kind_slug() -> str:
    """Slug of the first device's kind, e.g. 'TPU v5 lite' -> 'tpu-v5-lite'.

    Falls back to the backend platform name if devices can't be queried
    (the table then still works, just keyed more coarsely)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001 — never let table IO break tracing
        kind = "unknown"
    return re.sub(r"[^a-z0-9]+", "-", kind.lower()).strip("-") or "unknown"


def table_path() -> str:
    """Path the table is read from / written to.

    ``$AECF_TILE_TABLE`` overrides; default is a per-device-kind file under
    ``~/.cache/aecf_tpu/`` (override the cache root with ``$XDG_CACHE_HOME``).
    """
    env = os.environ.get("AECF_TILE_TABLE")
    if env:
        return env
    cache_root = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(
        cache_root, "aecf_tpu", f"tiles_{_device_kind_slug()}.json"
    )


def _validate(raw: object, path: str) -> Dict[str, int]:
    if not isinstance(raw, dict):
        warnings.warn(
            f"tile table {path!r} is not a JSON object; ignoring it",
            stacklevel=3,
        )
        return {}
    table: Dict[str, int] = {}
    bad = []
    for k, v in raw.items():
        if (
            isinstance(k, str)
            and isinstance(v, int)
            and not isinstance(v, bool)
            and v >= _MIN_TILE
            and v % _MIN_TILE == 0
        ):
            table[k] = v
        else:
            bad.append(k)
    if bad:
        warnings.warn(
            f"tile table {path!r}: dropping invalid entries {bad!r} "
            f"(values must be integer multiples of {_MIN_TILE}, "
            f">= {_MIN_TILE})",
            stacklevel=3,
        )
    return table


def load_table(path: Optional[str] = None) -> Dict[str, int]:
    """Load and validate a tile table; a missing file is an empty table."""
    path = path or table_path()
    try:
        with open(path) as f:
            raw = json.load(f)
    except FileNotFoundError:
        return {}
    except (OSError, json.JSONDecodeError) as e:
        warnings.warn(
            f"tile table {path!r} unreadable ({e}); ignoring it",
            stacklevel=2,
        )
        return {}
    return _validate(raw, path)


def set_table(table: Optional[Dict[str, int]]) -> None:
    """Install an explicit in-process table (shadows the file), or ``None``
    to fall back to the file.  Also drops the cached file table so the next
    lookup re-reads ``table_path()`` — tests and long-lived processes use
    this to pick up a freshly written table."""
    global _explicit, _file_cache
    with _lock:
        _explicit = dict(table) if table is not None else None
        _file_cache = None


def lookup(key: str) -> Optional[int]:
    """Measured tile for ``key``, or ``None`` (no entry → built-in default).

    The file table is read once per process (trace-time hot path); call
    :func:`set_table` (even ``set_table(None)``) to invalidate.
    """
    global _file_cache
    with _lock:
        if _explicit is not None:
            return _explicit.get(key)
        if _file_cache is None:
            _file_cache = load_table()
        return _file_cache.get(key)


def update_table(
    entries: Dict[str, int], path: Optional[str] = None
) -> str:
    """Merge ``entries`` into the table at ``path`` (atomic tmp+rename);
    returns the path written.  Existing keys are overwritten; a value of
    ``None``/0 deletes the key."""
    path = path or table_path()
    table = load_table(path)
    for k, v in entries.items():
        if not v:
            table.pop(k, None)
        elif (
            not isinstance(v, int) or v < _MIN_TILE or v % _MIN_TILE
        ):
            raise ValueError(
                f"tile entry {k!r}={v!r}: must be an int multiple of "
                f"{_MIN_TILE}, >= {_MIN_TILE}"
            )
        else:
            table[k] = v
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    with _lock:
        global _file_cache
        _file_cache = None
    return path


def start_recording() -> None:
    """Begin recording (site_key, chosen_tile, source) triples from every
    subsequent ``_pick_tile`` call — the autotuner traces a step once to
    discover which launch sites a config actually exercises."""
    global _recording
    with _lock:
        _recording = []


def stop_recording() -> List[Tuple[str, int, str]]:
    """End recording and return the trace log.  ``source`` is one of
    ``"env"`` / ``"table"`` / ``"default"``."""
    global _recording
    with _lock:
        log, _recording = _recording or [], None
    return log


def record(key: Optional[str], tile: int, source: str) -> None:
    """Internal: log one pick when recording is active (no-op otherwise)."""
    if _recording is None or key is None:
        return
    with _lock:
        if _recording is not None:
            _recording.append((key, tile, source))
