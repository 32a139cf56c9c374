"""Prefetching batch loader over the native C++ pipeline.

The reference feeds training through torch's DataLoader (C++ worker
machinery under the hood — train_xrays_example.py:247-248).  This module is
the TPU-native equivalent: a C++ ring-buffer pipeline
(aecf_tpu/native/batcher.cc) gathers shuffled rows into contiguous batch
buffers on a worker thread while the TPU runs the previous step, exposed
through ctypes with zero-copy numpy views.

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

__all__ = ["BatchLoader", "native_available", "build_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "batcher.cc")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaecf_batcher.so")

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
        if lib is None and existed:
            # a PRE-EXISTING .so that fails to dlopen is presumed stale/
            # corrupt (pre-atomic-build artifact): drop it and rebuild
            # once.  When the library didn't exist, the failure was the
            # fresh build/dlopen itself — retrying would just double the
            # up-to-120s g++ stall (and deleting would be a no-op).
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            lib = _dlopen(build_native())
        if lib is None:
            _lib_failed = True
            return None
        lib.aecf_batcher_create.restype = ctypes.c_void_p
        lib.aecf_batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
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
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.aecf_batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def _as_f32c(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


class BatchLoader:
    """Iterate shuffled (image, text, label) batches with prefetch.

    Args mirror the reference DataLoader usage: ``batch_size=64,
    shuffle=True`` (train_xrays_example.py:247-248), plus ``epochs`` (the
    pipeline pre-plans that many shuffled epochs) and ``drop_last`` (static
    shapes for jit).

    ``backend='native'`` requires the C++ pipeline; ``'numpy'`` forces the
    fallback; ``'auto'`` prefers native.
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
    ):
        self.image = _as_f32c(data["image"])
        self.text = _as_f32c(data["text"])
        self.label = _as_f32c(data["label"])
        self.n = self.image.shape[0]
        # Validate up front, identically for both backends: the C++
        # pipeline indexes rows 0..n-1 of EVERY array from the image's row
        # count — a shorter text/label buffer would be read out of bounds.
        for name in ("image", "text", "label"):
            arr = getattr(self, name)
            if arr.ndim != 2:
                raise ValueError(
                    f"{name} must be 2-D (rows, features), got shape "
                    f"{arr.shape}"
                )
            if arr.shape[0] != self.n:
                raise ValueError(
                    f"row mismatch: {name} has {arr.shape[0]} rows, "
                    f"image has {self.n}"
                )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.epochs = epochs
        self.seed = seed
        self.prefetch = prefetch

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
    def __iter__(
        self,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        if self.backend == "native":
            yield from self._iter_native()
        else:
            yield from self._iter_numpy()

    def _iter_native(self):
        lib = _load_lib()
        fp = ctypes.POINTER(ctypes.c_float)
        handle = lib.aecf_batcher_create(
            self.image.ctypes.data_as(fp),
            self.text.ctypes.data_as(fp),
            self.label.ctypes.data_as(fp),
            self.n,
            self.image.shape[1],
            self.text.shape[1],
            self.label.shape[1],
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
            img_p, txt_p, lab_p = fp(), fp(), fp()
            epoch = ctypes.c_int64()
            while True:
                rows = lib.aecf_batcher_acquire(
                    handle,
                    ctypes.byref(img_p),
                    ctypes.byref(txt_p),
                    ctypes.byref(lab_p),
                    ctypes.byref(epoch),
                )
                if rows == 0:
                    break
                # Zero-copy views into the ring buffer — valid until the
                # next acquire; jnp.asarray/device_put copies them out.
                img = np.ctypeslib.as_array(
                    img_p, shape=(rows, self.image.shape[1])
                )
                txt = np.ctypeslib.as_array(
                    txt_p, shape=(rows, self.text.shape[1])
                )
                lab = np.ctypeslib.as_array(
                    lab_p, shape=(rows, self.label.shape[1])
                )
                yield img, txt, lab
        finally:
            lib.aecf_batcher_destroy(handle)

    def _iter_numpy(self):
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
                yield self.image[sel], self.text[sel], self.label[sel]
