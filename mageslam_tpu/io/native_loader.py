"""ctypes bindings for the native frame pump (native/frame_pump.cpp).

The host-side C++ input runtime: threaded PNG/PGM/JPEG decode + bilinear
resize with a bounded prefetch ring (the reference keeps exactly this work
in C++ — console.cpp's VideoCapture path + Arcana's background dispatcher).
Falls back to a pure-python PIL loader when the shared library hasn't been
built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import heapq
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / \
    "libmageslam_io.so"
_lib: Optional[ctypes.CDLL] = None


def _build_native() -> bool:
    try:
        subprocess.run(["make", "-C",
                        str(_LIB_PATH.parent), "-s"], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except Exception:
        return False


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_if_missing:
        if not _build_native():
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pump_create.restype = ctypes.c_void_p
    lib.pump_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
    lib.pump_next.restype = ctypes.c_int
    lib.pump_next.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_float)]
    lib.pump_destroy.argtypes = [ctypes.c_void_p]
    lib.pump_decode_errors.restype = ctypes.c_int
    lib.pump_decode_errors.argtypes = [ctypes.c_void_p]
    lib.read_image_gray.restype = ctypes.c_int
    lib.read_image_gray.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int, ctypes.c_int]
    lib.image_size.restype = ctypes.c_int
    lib.image_size.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def read_image_gray(path: str, width: int, height: int) -> np.ndarray:
    """Single image -> (H, W) float32 grayscale in [0, 255]."""
    lib = load_library()
    if lib is not None:
        out = np.empty((height, width), np.float32)
        rc = lib.read_image_gray(
            path.encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)), width, height)
        if rc == 0:
            return out
        raise IOError(f"native decode failed: {path}")
    return _pil_read(path, width, height)


def _pil_read(path: str, width: int, height: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("L").resize((width, height),
                                               Image.BILINEAR)
    return np.asarray(img, np.float32)


class FramePump:
    """Ordered prefetching frame iterator over image paths."""

    def __init__(self, paths: Sequence[str], width: int, height: int,
                 capacity: int = 8, n_threads: int = 2):
        self._paths = [str(p) for p in paths]
        self._w, self._h = width, height
        self._lib = load_library()
        self._pump = None
        if self._lib is not None and self._paths:
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths])
            self._pump = self._lib.pump_create(
                arr, len(self._paths), width, height, capacity, n_threads)
            self._keepalive = arr

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        if self._pump is None:
            for i, p in enumerate(self._paths):
                yield i, _pil_read(p, self._w, self._h)
            return
        # native path: reorder out-of-order arrivals with a heap
        heap: list = []
        next_idx = 0
        n = len(self._paths)
        received = 0
        buf = np.empty((self._h, self._w), np.float32)
        while received < n:
            rc = self._lib.pump_next(
                self._pump,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc == -1000000:
                break
            received += 1
            idx = rc if rc >= 0 else -rc - 1
            frame = buf.copy() if rc >= 0 else None
            heapq.heappush(heap, (idx, frame))
            while heap and heap[0][0] == next_idx:
                i, fr = heapq.heappop(heap)
                if fr is not None:
                    yield i, fr
                next_idx += 1
        while heap:
            i, fr = heapq.heappop(heap)
            if fr is not None:
                yield i, fr

    def decode_errors(self) -> int:
        if self._pump is None or self._lib is None:
            return 0
        return self._lib.pump_decode_errors(self._pump)

    def close(self):
        if self._pump is not None and self._lib is not None:
            self._lib.pump_destroy(self._pump)
            self._pump = None

    def __del__(self):
        self.close()


def scan_dataset(root: str) -> list[str]:
    """Image paths for standard layouts: EuRoC (mav0/cam0/data/*.png),
    TUM (rgb/*.png), or a flat directory of images."""
    root_p = Path(root)
    candidates = [root_p / "mav0" / "cam0" / "data", root_p / "rgb", root_p]
    exts = {".png", ".pgm", ".ppm", ".jpg", ".jpeg"}
    for c in candidates:
        if c.is_dir():
            files = sorted(p for p in c.iterdir() if p.suffix.lower()
                           in exts)
            if files:
                return [str(p) for p in files]
    return []
