"""Device-mesh construction helpers.

The comm backend of this framework IS the XLA collective layer: meshes +
shardings compile to `psum`/`all_gather` over ICI within a slice and DCN
across slices (SURVEY.md §2.4/§5 — the reference has no distributed layer;
this is new TPU-native capability).  ``jax.distributed.initialize`` handles
multi-host bring-up; on a single host these helpers work over local (or
virtual CPU) devices unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "data_mesh", "data_model_mesh", "maybe_initialize_distributed"]


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Safe no-op on a single host / when already initialized.  Cluster
    environments JAX knows (GKE, SLURM, TPU pods) auto-detect; manual
    launches set ``JAX_COORDINATOR_ADDRESS`` (or ``COORDINATOR_ADDRESS``)
    plus ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``, which this helper
    passes through explicitly (jax.distributed.initialize does not read
    the count/id env vars itself).  Tested for real in
    tests/test_multihost.py with a two-process CPU cluster.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Tolerate ONLY re-initialization.  Swallowing every RuntimeError
        # would turn an unreachable/dead coordinator (XlaRuntimeError is a
        # RuntimeError subclass) into each host silently training alone on
        # its own shard — wrong results with no error.
        msg = str(e).lower()
        if (
            "only be called once" not in msg
            and "already initialized" not in msg
        ):
            raise


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over ``devices`` (default: all) with the given logical axes."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    arr = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names))


def data_mesh(
    num_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D ``('data',)`` mesh — the batch-parallel layout for this workload
    (BASELINE.json config #5: data-parallel across v5e-8)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    return make_mesh((num_devices,), ("data",), devices=devices)


def data_model_mesh(
    num_devices: Optional[int] = None,
    model_parallelism: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``('data', 'model')`` mesh for combined DP + tensor parallelism.

    ``model`` shards attention heads / hidden dims; for the AECF workload
    (E ≤ 1024) TP is optional headroom, not a requirement (SURVEY.md §2.4).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices % model_parallelism:
        raise ValueError(
            f"num_devices {num_devices} not divisible by model_parallelism "
            f"{model_parallelism}"
        )
    return make_mesh(
        (num_devices // model_parallelism, model_parallelism),
        ("data", "model"),
        devices=devices,
    )
