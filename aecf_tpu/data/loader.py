"""Prefetching batch loader over the native C++ pipeline.

The reference feeds training through torch's DataLoader (C++ worker
machinery under the hood — train_xrays_example.py:247-248).  This module is
the TPU-native equivalent: a C++ ring-buffer pipeline
(aecf_tpu/native/batcher.cc) gathers shuffled rows into contiguous batch
buffers on a worker thread while the TPU runs the previous step, exposed
through ctypes with zero-copy numpy views.

Streams are generic (ABI v2): any number of named 2-D arrays of any dtype
share one shuffled row index — so an int8-quantized feature store (4× more
rows per host than f32, see :func:`quantize_rows`), its per-row scales, bf16
tables, and f32 labels all ride the same ring buffer.

Falls back to a pure-numpy implementation with identical semantics when the
native library can't be built (no compiler); the fallback is also the
correctness reference in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

__all__ = [
    "BatchLoader",
    "native_available",
    "build_native",
    "quantize_rows",
]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "batcher.cc")
# ABI-versioned filename: a pre-v2 .so on disk (fixed 3×f32-stream
# signature) is simply never opened — no dlopen cache games needed.
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaecf_batcher_v2.so")

_lib = None
_lib_failed = False
_lib_lock = threading.Lock()


def build_native(force: bool = False) -> Optional[str]:
    """Compile the native batcher (g++); returns the .so path or None."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    # Link to a temp path and os.replace into place: an interrupted or
    # concurrent build must never leave a half-written .so at _LIB_PATH
    # (os.path.exists would then return it forever and CDLL would fail).
    tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-pthread",
                _SRC,
                "-o",
                tmp,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _dlopen(path: Optional[str]):
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


def _abi_ok(lib) -> bool:
    try:
        lib.aecf_batcher_abi.restype = ctypes.c_int32
        return lib.aecf_batcher_abi() == 2
    except AttributeError:
        return False


def _load_lib():
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            # remember failure: re-running the (up to 120s) g++ attempt on
            # every BatchLoader construction would stall each one
            return None
        existed = os.path.exists(_LIB_PATH)
        lib = _dlopen(build_native())
        if (lib is None or not _abi_ok(lib)) and existed:
            # a PRE-EXISTING .so that fails to dlopen or speaks the wrong
            # ABI is presumed stale/corrupt: drop it and rebuild once.
            # When the library didn't exist, the failure was the fresh
            # build/dlopen itself — retrying would just double the
            # up-to-120s g++ stall (and deleting would be a no-op).
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            lib = _dlopen(build_native())
        if lib is None or not _abi_ok(lib):
            _lib_failed = True
            return None
        lib.aecf_batcher_create.restype = ctypes.c_void_p
        lib.aecf_batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.aecf_batcher_acquire.restype = ctypes.c_int64
        lib.aecf_batcher_acquire.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.aecf_batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def quantize_rows(table: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization of a 2-D feature table.

    Returns ``(q (N, D) int8, scales (N, 1) f32)`` with
    ``q * scales ≈ table`` — the same symmetric-absmax scheme as
    :func:`aecf_tpu.kernels.quantize_features` (which quantizes stacked
    ``(B, M, E)`` modalities per (row, modality); this is its 2-D
    feature-store form).  Both outputs are 2-D so they ride the loader as
    ordinary streams; ``scales`` stays f32 because the dequant multiply
    happens on device, where XLA fuses it into the consuming GEMM.
    """
    table = np.ascontiguousarray(table, dtype=np.float32)
    if table.ndim != 2:
        raise ValueError(f"table must be 2-D (rows, dim), got {table.shape}")
    absmax = np.abs(table).max(axis=1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(
        np.round(table / scales[:, None]), -127, 127
    ).astype(np.int8)
    return q, scales[:, None]


def _prep_stream(name: str, x: np.ndarray) -> np.ndarray:
    x = np.asarray(x)
    if x.dtype == np.float64:
        # f64 is never what a TPU pipeline wants; everything else (f32,
        # bf16, f16, int8, bool labels, ...) is carried at its own dtype.
        x = x.astype(np.float32)
    x = np.ascontiguousarray(x)
    if x.ndim != 2:
        raise ValueError(
            f"{name} must be 2-D (rows, features), got shape {x.shape}"
        )
    return x


class BatchLoader:
    """Iterate shuffled batches of named streams with prefetch.

    ``data`` maps stream names to 2-D ``(rows, dim)`` arrays sharing a row
    count; every batch gathers the SAME shuffled rows from each stream.
    Iteration yields tuples in the dict's insertion order (the canonical
    ``{image, text, label}`` key set always yields in that order, whatever
    the insertion order, for reference-protocol compatibility).  Arrays keep
    their dtype (float64 is downcast to float32), so quantized stores ride
    as-is::

        q, scales = quantize_rows(clip_features)   # int8 + (N, 1) f32
        loader = BatchLoader({"image": q, "image_scale": scales,
                              "label": labels}, batch_size=256)

    Args mirror the reference DataLoader usage: ``batch_size=64,
    shuffle=True`` (train_xrays_example.py:247-248), plus ``epochs`` (the
    pipeline pre-plans that many shuffled epochs) and ``drop_last`` (static
    shapes for jit).

    ``backend='native'`` requires the C++ pipeline; ``'numpy'`` forces the
    fallback; ``'auto'`` prefers native.

    ``copy_out=False`` (native backend only) yields zero-copy views into the
    ring buffer instead of fresh arrays.  Expert mode: a view is only valid
    until the worker reuses its slot (``prefetch`` acquires later) and no
    later than the end of iteration (the generator's exit frees the ring
    buffer), and feeding it to jax does NOT guarantee a copy — CPU jax's
    ``jnp.asarray`` zero-copy aliases suitably aligned host buffers, so a
    retained or lazily-consumed view can be silently overwritten by a later
    batch.  Only use it when every byte is consumed (e.g. explicitly
    copied or fetched to device) before the next ``prefetch`` batches are
    drawn.
    """

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int = 64,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        epochs: int = 1,
        seed: int = 0,
        prefetch: int = 3,
        backend: str = "auto",
        copy_out: bool = True,
    ):
        if not data:
            raise ValueError("data must contain at least one stream")
        names = list(data.keys())
        if set(names) == {"image", "text", "label"}:
            names = ["image", "text", "label"]
        self.stream_names = tuple(names)
        self.streams = {n: _prep_stream(n, data[n]) for n in names}
        first = self.stream_names[0]
        self.n = self.streams[first].shape[0]
        # Validate up front, identically for both backends: the C++
        # pipeline indexes rows 0..n-1 of EVERY array from the first
        # stream's row count — a shorter buffer would be read out of
        # bounds.
        for name in self.stream_names:
            arr = self.streams[name]
            if arr.shape[0] != self.n:
                raise ValueError(
                    f"row mismatch: {name} has {arr.shape[0]} rows, "
                    f"{first} has {self.n}"
                )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.epochs = epochs
        self.seed = seed
        self.prefetch = prefetch
        self.copy_out = copy_out

        if backend not in ("auto", "native", "numpy"):
            raise ValueError(
                f"backend must be 'auto', 'native' or 'numpy', got "
                f"{backend!r}"
            )
        if backend == "auto":
            # Prefetch overlap needs a spare core: on a single-CPU host the
            # worker thread just contends with the consumer (measured 7x
            # slower end-to-end on a 1-vCPU box).
            backend = (
                "native"
                if native_available() and (os.cpu_count() or 1) > 1
                else "numpy"
            )
        elif backend == "native" and not native_available():
            raise RuntimeError("native batcher unavailable (no g++?)")
        self.backend = backend

    def __len__(self) -> int:
        per_epoch = (
            self.n // self.batch_size
            if self.drop_last
            else -(-self.n // self.batch_size)
        )
        return per_epoch * self.epochs

    # -- iteration -------------------------------------------------------------
    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        if self.backend == "native":
            yield from self._iter_native()
        else:
            yield from self._iter_numpy()

    def _iter_native(self):
        lib = _load_lib()
        arrs = [self.streams[n] for n in self.stream_names]
        S = len(arrs)
        ptrs = (ctypes.c_void_p * S)(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs]
        )
        row_bytes = (ctypes.c_int64 * S)(
            *[a.shape[1] * a.itemsize for a in arrs]
        )
        handle = lib.aecf_batcher_create(
            ptrs,
            row_bytes,
            S,
            self.n,
            self.batch_size,
            self.epochs,
            self.prefetch,
            self.seed,
            1 if self.shuffle else 0,
            1 if self.drop_last else 0,
        )
        if not handle:
            raise RuntimeError("failed to create native batcher")
        try:
            out = (ctypes.c_void_p * S)()
            epoch = ctypes.c_int64()
            while True:
                rows = lib.aecf_batcher_acquire(
                    handle, out, ctypes.byref(epoch)
                )
                if rows == 0:
                    break
                # Views into the ring buffer — only valid until the worker
                # reuses the slot (`prefetch` acquires later).  Copied out
                # by default: handing a transient view to the caller is a
                # correctness trap, because CPU jax's jnp.asarray ALIASES
                # aligned host buffers instead of copying (see the class
                # docstring / copy_out).
                batch = []
                for s, a in enumerate(arrs):
                    nbytes = rows * a.shape[1] * a.itemsize
                    buf = np.ctypeslib.as_array(
                        ctypes.cast(
                            out[s], ctypes.POINTER(ctypes.c_uint8)
                        ),
                        shape=(nbytes,),
                    )
                    view = buf.view(a.dtype).reshape(rows, a.shape[1])
                    batch.append(np.array(view) if self.copy_out else view)
                yield tuple(batch)
        finally:
            lib.aecf_batcher_destroy(handle)

    def _iter_numpy(self):
        arrs = [self.streams[n] for n in self.stream_names]
        for epoch in range(self.epochs):
            if self.shuffle:
                # Fisher-Yates with the same per-epoch seeding contract as
                # the native pipeline (values differ across backends; the
                # determinism contract per backend is what tests pin).
                rng = np.random.default_rng(self.seed + epoch)
                idx = rng.permutation(self.n)
            else:
                idx = np.arange(self.n)
            for start in range(0, self.n, self.batch_size):
                sel = idx[start : start + self.batch_size]
                if self.drop_last and len(sel) < self.batch_size:
                    break
                yield tuple(a[sel] for a in arrs)
