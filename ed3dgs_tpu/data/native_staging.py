"""ctypes wrapper for the native image staging pipeline (native/staging.cpp).

Usage:
    stager = Stager(workers=2)           # None if the .so is not built
    stager.submit(cam)                   # async decode+resize on C++ threads
    img, mask, seg = stager.fetch(cam)   # blocks only if not done yet

Falls back transparently: callers check `Stager.available()` / get None and
use the PIL loader. The train tool prefetches the next batch while the device
runs the current step, hiding host decode latency entirely.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libed3dgs_staging.so"),
    os.path.join(os.path.dirname(__file__), "libed3dgs_staging.so"),
]


def _load_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.staging_init.argtypes = [ctypes.c_int]
            lib.staging_submit.argtypes = [
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_int]
            lib.staging_fetch.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
            return lib
    return None


_lib = None
_lib_lock = threading.Lock()


def get_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _load_lib()
        return _lib


class Stager:
    """Async native image loader; one instance per process."""

    def __init__(self, workers: int = 2, load_tongue: bool = False):
        self._lib = get_lib()
        self._next_id = 0
        self._pending = {}
        self.load_tongue = load_tongue
        if self._lib is not None:
            self._lib.staging_init(workers)

    @staticmethod
    def available() -> bool:
        return get_lib() is not None

    def submit(self, cam) -> bool:
        """Queue async decode for a Camera; returns False if unavailable or
        the image is already cached on the camera."""
        if self._lib is None or cam._image is not None or id(cam) in self._pending:
            return False
        if not cam.image_path.lower().endswith(".png"):
            return False
        seg = None
        if self.load_tongue:
            sp = cam.image_path.replace("images", "segmentations")
            if os.path.exists(sp):
                seg = sp.encode()
        rid = self._next_id
        self._next_id += 1
        ok = self._lib.staging_submit(rid, cam.image_path.encode(), seg,
                                      cam.width, cam.height)
        if ok:
            self._pending[id(cam)] = (rid, seg is not None)
        return bool(ok)

    def fetch_into(self, cam) -> bool:
        """Complete a pending request and install the arrays on the camera.
        Returns False if nothing was pending (caller uses the PIL path)."""
        entry = self._pending.pop(id(cam), None)
        if entry is None:
            return False
        rid, want_seg = entry
        h, w = cam.height, cam.width
        img = np.empty((3, h, w), np.float32)
        mask = np.empty((1, h, w), np.float32)
        seg = np.empty((1, h, w), np.float32) if want_seg else None
        flags = self._lib.staging_fetch(
            rid, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if seg is not None else None)
        if not flags & 1:
            return False
        cam._image = img
        cam._mask = mask if flags & 2 else None
        cam._tongue_mask = seg if (flags & 4) else None
        return True
