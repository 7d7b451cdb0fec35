"""ctypes binding for the native C++ frame loader (native/frame_loader.cpp).

The reference decodes dataset PNGs synchronously on the tracking thread
(Examples/RGB-D/main.cc); this loader decodes and converts TUM PNG pairs in
a background C++ thread with a bounded prefetch ring, so frame IO overlaps
device compute. Falls back to the pure-Python TUMDataset when the shared
library has not been built (make -C native)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libframe_loader.so")


def build_native(force: bool = False) -> bool:
    """Compile the loader with the repo Makefile; True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


class NativeTUMLoader:
    """Iterator over (index, gray, depth) with C++ decode + prefetch."""

    def __init__(self, dataset, queue_cap: int = 4):
        """dataset: a TUMDataset (uses its association rows and paths)."""
        if not build_native():
            raise RuntimeError(
                "native loader unavailable; run `make -C native` "
                "(falling back to TUMDataset is always possible)")
        self._lib = ctypes.CDLL(_LIB_PATH)
        self._lib.loader_open.restype = ctypes.c_void_p
        self._lib.loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int]
        self._lib.loader_next_ex.restype = ctypes.c_int
        self._lib.loader_next_ex.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_int)]
        self._lib.loader_close.argtypes = [ctypes.c_void_p]

        self.dataset = dataset
        self.timestamps = [r[0] for r in dataset.rows]
        import PIL.Image
        probe = PIL.Image.open(os.path.join(dataset.root, dataset.rows[0][1]))
        self.w, self.h = probe.size

        gp = [os.path.join(dataset.root, r[1]).encode() for r in dataset.rows]
        dp = [os.path.join(dataset.root, r[3]).encode() for r in dataset.rows]
        GArr = ctypes.c_char_p * len(gp)
        self._handle = self._lib.loader_open(
            GArr(*gp), GArr(*dp), len(gp), self.w, self.h,
            float(dataset.depth_factor), queue_cap)

    def __iter__(self):
        """Yields (index, timestamp, gray, depth); frames whose PNGs failed
        to decode (corrupt, palette, interlaced) fall back to the PIL path
        and raise there if genuinely unreadable -- a decode failure must not
        silently feed black frames into tracking."""
        gray = np.empty((self.h, self.w), np.float32)
        depth = np.empty((self.h, self.w), np.float32)
        err = ctypes.c_int(0)
        while True:
            idx = self._lib.loader_next_ex(self._handle, gray, depth,
                                           ctypes.byref(err))
            if idx < 0:
                break
            if err.value != 0:
                fr = self.dataset[idx]   # PIL fallback (raises if unreadable)
                yield idx, self.timestamps[idx], fr.gray, fr.depth
                continue
            yield idx, self.timestamps[idx], gray.copy(), depth.copy()

    def close(self):
        if self._handle:
            self._lib.loader_close(self._handle)
            self._handle = None
