"""ctypes bindings for the native C++ prefetching dataset loader
(`native/plslam_loader.cpp`). Builds on first use; falls back to
cv2-based synchronous decoding if the toolchain is unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "plslam_loader.cpp")
_SO = os.path.join(_REPO, "native", "libplslam_loader.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
           "-lpng", "-ljpeg", "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_gray.restype = ctypes.c_int
    lib.decode_gray.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return lib


class PrefetchLoader:
    """Iterate grayscale uint8 frames decoded by background C++ threads."""

    MAX_BYTES = 4096 * 3072

    def __init__(self, paths: Sequence[str], queue_depth: int = 4,
                 n_threads: int = 2):
        self.paths = list(paths)
        lib = _lib()
        self._native = lib is not None
        if self._native:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = lib.loader_create(arr, len(self.paths), queue_depth,
                                        n_threads)
            self._lib_ref = lib
        self._i = 0

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self.paths):
            raise StopIteration
        self._i += 1
        if self._native:
            buf = np.empty(self.MAX_BYTES, np.uint8)
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib_ref.loader_next(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.MAX_BYTES, ctypes.byref(w), ctypes.byref(h))
            if rc != 0:
                raise IOError(f"native loader error {rc} at frame {self._i - 1}")
            return buf[: w.value * h.value].reshape(h.value, w.value).copy()
        import cv2
        img = cv2.imread(self.paths[self._i - 1], cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(self.paths[self._i - 1])
        return img

    def close(self):
        if self._native and getattr(self, "_h", None):
            self._lib_ref.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_gray(path: str) -> np.ndarray:
    """One-shot native decode (cv2 fallback)."""
    lib = _lib()
    if lib is None:
        import cv2
        return cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    buf = np.empty(PrefetchLoader.MAX_BYTES, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.decode_gray(path.encode(),
                         buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         PrefetchLoader.MAX_BYTES, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"decode_gray({path}) -> {rc}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()
