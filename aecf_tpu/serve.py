"""Batched inference serving for fusion models.

Production-serving conveniences the reference leaves to the caller: a
predictor that jit-compiles per padded batch bucket (static shapes for XLA),
pads ragged request batches, zeroes absent modalities (the framework's
missing-modality convention), and optionally returns calibrated
probabilities.

Usage::

    predictor = FusionPredictor(
        model.apply, params,
        modality_names=("image", "text"), buckets=(32, 256),
    )
    probs = predictor(image=imgs, text=txts)           # any batch size
    probs = predictor(image=imgs)                      # text missing → zeros
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FusionPredictor",
    "ExportedFusionPredictor",
    "MicroBatcher",
    "pad_to_bucket",
    "export_predictor",
    "load_exported_predictor",
]


def pad_to_bucket(
    n: int, buckets: Sequence[int]
) -> int:
    """Smallest bucket ≥ n (last bucket used for chunking larger batches)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class FusionPredictor:
    """Jit-cached batched predictor over a model apply function.

    Args:
      apply_fn: ``apply_fn(params, **modalities) -> logits`` (eval mode —
        wrap your model's apply with ``training=False`` baked in).
      params: parameter pytree (e.g. restored via
        :func:`aecf_tpu.train.load_params`).
      buckets: padded batch sizes to compile for; requests larger than the
        biggest bucket are chunked.
      modality_names: keyword order for ``apply_fn``.
      apply_sigmoid: return probabilities instead of logits.
      mesh: optional :class:`jax.sharding.Mesh` for multi-chip
        data-parallel serving — every bucket call shards its batch axis
        over ``data_axis`` with params replicated (GSPMD; XLA inserts
        the input scatter / output gather).  Buckets must be divisible
        by the axis size.
      data_axis: mesh axis name carrying the batch dimension.
    """

    def __init__(
        self,
        apply_fn: Callable[..., jax.Array],
        params: Any,
        *,
        modality_names: Sequence[str],
        buckets: Sequence[int] = (32, 256, 1024),
        apply_sigmoid: bool = True,
        mesh: "jax.sharding.Mesh | None" = None,
        data_axis: str = "data",
    ):
        self.params = params
        self.modality_names = tuple(modality_names)
        self.buckets = tuple(sorted(buckets))
        self.apply_sigmoid = apply_sigmoid
        self.calls = 0
        self._dims: Dict[str, int] = {}

        def _run(params, *mods):
            logits = apply_fn(
                params, **dict(zip(self.modality_names, mods))
            )
            return jax.nn.sigmoid(logits) if apply_sigmoid else logits

        self._input_sharding = None
        if mesh is None:
            self._jitted = jax.jit(_run)
        else:
            # Multi-chip data-parallel serving: each bucket call is one
            # GSPMD program with the batch axis sharded over ``data_axis``
            # (params replicated, per-row eval forward — no collectives in
            # the program body, so the only cross-chip traffic is the
            # input scatter / output gather).  Buckets must divide evenly:
            # a ragged last shard would change the padded program shape.
            n_shards = mesh.shape[data_axis]
            bad = [b for b in self.buckets if b % n_shards]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by mesh axis "
                    f"{data_axis!r} (size {n_shards})"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            batched = NamedSharding(mesh, PartitionSpec(data_axis))
            replicated = NamedSharding(mesh, PartitionSpec())
            # Host batches are staged with device_put AT this sharding:
            # jnp.asarray would place the whole padded bucket on one chip
            # first and have jit rescatter it device-to-device (the same
            # gotcha train/fit.py documents for global batches).
            self._input_sharding = batched
            self._jitted = jax.jit(
                _run,
                in_shardings=(
                    replicated,
                    *([batched] * len(self.modality_names)),
                ),
                out_shardings=batched,
            )

    def __call__(self, **modalities: np.ndarray) -> np.ndarray:
        """Predict for any subset of modalities; absent ones are zeroed.

        All provided arrays must share batch dimension; at least one
        modality is required (the reference's contract,
        README.md:252-254).
        """
        provided = {
            k: np.asarray(v, dtype=np.float32)
            for k, v in modalities.items()
            if v is not None
        }
        if not provided:
            raise ValueError("At least one modality must be provided")
        unknown = set(provided) - set(self.modality_names)
        if unknown:
            raise ValueError(
                f"unknown modalities {sorted(unknown)}; expected "
                f"{self.modality_names}"
            )
        for k, v in provided.items():
            if v.ndim != 2:
                raise ValueError(
                    f"modality {k!r} must be (batch, features), got "
                    f"shape {v.shape}"
                )
        n = next(iter(provided.values())).shape[0]
        for k, v in provided.items():
            if v.shape[0] != n:
                raise ValueError(
                    f"batch mismatch: {k} has {v.shape[0]} rows, expected {n}"
                )
        if n == 0:
            # the chunk loop below would run zero device calls and
            # np.concatenate([]) raises an opaque error
            raise ValueError("batch must have at least one row (got 0)")

        self._check_dims(provided)
        missing = [
            k for k in self.modality_names
            if k not in provided
        ]
        for k in missing:
            if k not in self._dims:
                raise ValueError(
                    f"cannot infer feature dim for absent modality {k!r}; "
                    "call once with it present, or pass an explicit zeros "
                    "array"
                )

        outs = []
        max_bucket = self.buckets[-1]
        start = 0
        while start < n:
            chunk_n = min(n - start, max_bucket)
            bucket = pad_to_bucket(chunk_n, self.buckets)
            mods = []
            for k in self.modality_names:
                if k in provided:
                    x = provided[k][start : start + chunk_n]
                else:
                    x = np.zeros((chunk_n, self._dims[k]), np.float32)
                if chunk_n < bucket:
                    x = np.concatenate(
                        [x, np.zeros((bucket - chunk_n, x.shape[1]),
                                     np.float32)]
                    )
                if self._input_sharding is not None:
                    mods.append(jax.device_put(x, self._input_sharding))
                else:
                    mods.append(jnp.asarray(x))
            out = np.asarray(self._call_bucket(bucket, mods))
            # device-call counter (micro-batching observability): one per
            # SUCCESSFUL bucket dispatch — a chunked request counts once
            # per chunk, a request failing validation counts zero.
            self.calls += 1
            outs.append(out[:chunk_n])
            start += chunk_n
        # Commit dims only AFTER every device call succeeded: recording a
        # request's width up front would let one bad-width first request
        # permanently poison the predictor (its width stored, the call
        # failing, every later correct-width request rejected against the
        # stale record).
        self._commit_dims(provided)
        return np.concatenate(outs)

    def _check_dims(self, provided: Dict[str, np.ndarray]) -> None:
        """Reject widths that contradict an already-committed dim: the
        jitted model has fixed feature widths, so the device call would
        fail anyway — failing here gives a clear message and keeps the
        zero-fill width for absent modalities trustworthy.
        :class:`ExportedFusionPredictor` overrides this — its dims are
        fixed by the exported programs' config."""
        for k, v in provided.items():
            prev = self._dims.get(k)
            if prev is not None and v.shape[1] != prev:
                raise ValueError(
                    f"modality {k!r} has feature dim {v.shape[1]}, but "
                    f"this predictor previously saw {prev}"
                )

    def _commit_dims(self, provided: Dict[str, np.ndarray]) -> None:
        for k, v in provided.items():
            self._dims[k] = v.shape[1]

    def _call_bucket(self, bucket: int, mods: List[jnp.ndarray]) -> Any:
        """One device call at a padded bucket shape (overridden by
        :class:`ExportedFusionPredictor`)."""
        return self._jitted(self.params, *mods)


class MicroBatcher:
    """Request coalescing: concurrent single/small requests ride one device
    call.

    Production front ends receive many small independent requests; padding
    each to a bucket wastes the chip.  The micro-batcher queues requests for
    up to ``max_wait_ms`` (or until ``max_batch`` rows accumulate), groups
    them by modality key-set (rows with different provided modalities cannot
    share a zero-fill pattern), concatenates, runs ONE predictor call per
    group, and scatters the rows back to their callers' futures.

    Thread-safe; callers block in ``__call__`` until their slice is ready.

    Usage::

        batcher = MicroBatcher(predictor, max_batch=256, max_wait_ms=3.0)
        probs = batcher(image=img_row)        # from any number of threads
        batcher.stop()
    """

    def __init__(
        self,
        predictor: FusionPredictor,
        *,
        max_batch: int = 256,
        max_wait_ms: float = 3.0,
    ):
        self.predictor = predictor
        self.modality_names = predictor.modality_names
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue: List[Tuple[Tuple[str, ...], Dict[str, np.ndarray], Future]] = []
        self._stopping = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def __call__(self, **modalities: np.ndarray) -> np.ndarray:
        mods = {
            k: np.asarray(v, np.float32)
            for k, v in modalities.items()
            if v is not None
        }
        if not mods:
            raise ValueError("At least one modality must be provided")
        # Validate shape HERE, in the caller's thread: a malformed array
        # reaching the worker's window loop would kill the daemon thread
        # and wedge every pending and future request forever.
        for k, v in mods.items():
            if v.ndim != 2:
                raise ValueError(
                    f"modality {k!r} must be (batch, features), got "
                    f"shape {v.shape}"
                )
        # A request whose own modalities disagree on rows would pass the
        # keyset grouping (which only sees (name, width)), concatenate
        # with well-formed neighbors, and fail the WHOLE group at the
        # predictor's batch-mismatch check — reject it here instead.
        rows = {v.shape[0] for v in mods.values()}
        if len(rows) > 1:
            raise ValueError(
                "all modalities in one request must share a batch "
                f"dimension, got rows {sorted(rows)}"
            )
        if rows == {0}:
            raise ValueError("batch must have at least one row (got 0)")
        fut: Future = Future()
        # Group key includes per-modality feature dims: two requests with
        # the same modality key-set but different widths must not share a
        # np.concatenate (one malformed request would fail its whole
        # group, well-formed neighbors included).
        keyset = tuple(sorted((k, v.shape[1]) for k, v in mods.items()))
        with self._cv:
            if self._stopping:
                raise RuntimeError("MicroBatcher is stopped")
            self._queue.append((keyset, mods, fut))
            self._cv.notify()
        return fut.result()

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stopping:
                    self._cv.wait()
                if self._stopping and not self._queue:
                    return
                # batching window: wait for more arrivals (bounded)
                deadline = time.monotonic() + self.max_wait
                while (
                    sum(
                        next(iter(m.values())).shape[0]
                        for _, m, _ in self._queue
                    )
                    < self.max_batch
                    and not self._stopping
                ):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                batch, self._queue = self._queue, []

            # group by modality key-set; one device call per group
            groups: Dict[Tuple[str, ...], List[Tuple[Dict, Future]]] = {}
            for keyset, mods, fut in batch:
                groups.setdefault(keyset, []).append((mods, fut))
            for keyset, items in groups.items():
                try:
                    stacked = {
                        k: np.concatenate([m[k] for m, _ in items])
                        for k, _dim in keyset
                    }
                    out = self.predictor(**stacked)
                    start = 0
                    for mods, fut in items:
                        n = next(iter(mods.values())).shape[0]
                        fut.set_result(out[start : start + n])
                        start += n
                except Exception as e:  # noqa: BLE001 — serving boundary
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)

    def stop(self) -> None:
        with self._cv:
            self._stopping = True
            self._cv.notify_all()
        self._worker.join(timeout=5)


# ---------------------------------------------------------------------------
# Frozen serving artifacts (jax.export)
# ---------------------------------------------------------------------------


def export_predictor(
    predictor: FusionPredictor,
    path: str,
    *,
    feature_dims: Dict[str, int] | None = None,
    platforms: Sequence[str] | None = None,
) -> None:
    """Freeze a predictor into a self-contained serving artifact.

    For every batch bucket, the eval forward is exported as a StableHLO
    program (``jax.export``) with the parameters baked in as constants —
    the artifact (one ``.npz``) is then servable with jax alone: no model
    code, no parameter files, no retracing at load time.  The analogue of
    the torch ecosystem's TorchScript/SavedModel deployment story.

    Args:
      feature_dims: ``{modality: feature_dim}``.  Inferred from the
        predictor's call history when omitted (call it once with every
        modality present first).
      platforms: lowering targets (e.g. ``("tpu", "cpu")``); defaults to
        the current backend.  Params are duplicated per bucket as program
        constants — fine for fusion-pool-scale params (a few MB).
    """
    import json

    from jax import export as jexport

    if isinstance(predictor, ExportedFusionPredictor):
        # type-compatible but has no live _jitted/params to re-trace;
        # without this guard the first bucket dies with a bare
        # AttributeError mid-export
        raise TypeError(
            "cannot re-export a frozen ExportedFusionPredictor — export "
            "from the live FusionPredictor (the original artifact file is "
            "already the serialized form)"
        )
    dims = dict(feature_dims or predictor._dims)
    missing = [k for k in predictor.modality_names if k not in dims]
    if missing:
        raise ValueError(
            f"feature dims unknown for {missing}; pass feature_dims= or "
            "call the predictor once with every modality present"
        )

    arrays: Dict[str, np.ndarray] = {}
    for b in predictor.buckets:
        args = [
            jax.ShapeDtypeStruct((b, dims[k]), jnp.float32)
            for k in predictor.modality_names
        ]

        def frozen(*mods):
            return predictor._jitted(predictor.params, *mods)

        exp = jexport.export(
            jax.jit(frozen),
            platforms=list(platforms) if platforms else None,
        )(*args)
        arrays[f"bucket_{b}"] = np.frombuffer(
            exp.serialize(), dtype=np.uint8
        )

    config = {
        "modality_names": list(predictor.modality_names),
        "buckets": list(predictor.buckets),
        "apply_sigmoid": predictor.apply_sigmoid,
        "feature_dims": {k: int(v) for k, v in dims.items()},
    }
    arrays["config"] = np.frombuffer(
        json.dumps(config).encode(), dtype=np.uint8
    )
    # np.savez appends '.npz' when missing but np.load does not — normalize
    # so export/load accept the identical path string.
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    np.savez(path, **arrays)


class ExportedFusionPredictor(FusionPredictor):
    """A :class:`FusionPredictor` backed by frozen StableHLO programs —
    same padding/bucketing/missing-modality front end, no Python model."""

    def __init__(self, blobs: Dict[int, bytes], config: Dict[str, Any]):
        from jax import export as jexport

        self.params = None
        self.modality_names = tuple(config["modality_names"])
        self.buckets = tuple(sorted(config["buckets"]))
        self.apply_sigmoid = bool(config["apply_sigmoid"])
        self.calls = 0
        self._dims = {k: int(v) for k, v in config["feature_dims"].items()}
        self._input_sharding = None  # frozen programs are single-device
        missing = [b for b in self.buckets if b not in blobs]
        if missing:
            raise ValueError(
                f"artifact is missing programs for buckets {missing} "
                f"(config declares {list(self.buckets)}) — truncated or "
                "mismatched export"
            )
        self._exported = {
            b: jexport.deserialize(blob) for b, blob in blobs.items()
        }
        # Jit the call wrapper once per bucket: Exported.call invoked
        # eagerly goes through per-call primitive dispatch (apply_primitive
        # re-enters the tracing machinery and rebuilds the call each time),
        # which we measured at +590ms/call on the B=1024 bucket vs the live
        # jitted path.  Under jit the deserialized program compiles once and
        # every later call is a cached executable launch, same as live.
        self._compiled = {
            b: jax.jit(exp.call) for b, exp in self._exported.items()
        }

    def _check_dims(self, provided: Dict[str, np.ndarray]) -> None:
        # The exported programs' input shapes are frozen — config dims are
        # authoritative.  Accepting a request's width would corrupt the
        # zero-fill width for later requests omitting that modality;
        # reject mismatches at the request boundary instead.
        for k, v in provided.items():
            want = self._dims[k]
            if v.shape[1] != want:
                raise ValueError(
                    f"modality {k!r} has feature dim {v.shape[1]}, but the "
                    f"exported artifact expects {want}"
                )

    def _commit_dims(self, provided: Dict[str, np.ndarray]) -> None:
        pass  # config dims are authoritative and never updated

    def _call_bucket(self, bucket: int, mods: List[jnp.ndarray]) -> Any:
        return self._compiled[bucket](*mods)


def load_exported_predictor(path: str) -> ExportedFusionPredictor:
    """Load an :func:`export_predictor` artifact (no model code needed)."""
    import json
    import os

    if not str(path).endswith(".npz") and not os.path.exists(path):
        path = f"{path}.npz"
    with np.load(path) as data:
        if "config" not in data.files:
            raise ValueError(
                f"{path} is not an export_predictor artifact "
                "(no 'config' entry)"
            )
        config = json.loads(bytes(data["config"]).decode())
        blobs = {
            int(name.split("_", 1)[1]): bytes(data[name])
            for name in data.files
            if name.startswith("bucket_")
        }
    return ExportedFusionPredictor(blobs, config)
