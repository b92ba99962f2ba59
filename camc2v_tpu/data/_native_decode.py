"""ctypes bindings for the C++ libav decode stage (native/decode/).

Loaded opportunistically by data/video_io.VideoReader; `make -C native/decode`
produces `libcamc2v_decode.so` next to this file. Raises ImportError when the
library isn't built, letting the reader fall back to OpenCV.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcamc2v_decode.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native decode library not built ({_LIB_PATH}); run `make -C native/decode`")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.vd_open.restype = ctypes.c_void_p
_lib.vd_open.argtypes = [ctypes.c_char_p]
_lib.vd_close.argtypes = [ctypes.c_void_p]
_lib.vd_num_frames.restype = ctypes.c_long
_lib.vd_num_frames.argtypes = [ctypes.c_void_p]
_lib.vd_fps.restype = ctypes.c_double
_lib.vd_fps.argtypes = [ctypes.c_void_p]
_lib.vd_width.restype = ctypes.c_int
_lib.vd_width.argtypes = [ctypes.c_void_p]
_lib.vd_height.restype = ctypes.c_int
_lib.vd_height.argtypes = [ctypes.c_void_p]
_lib.vd_get_batch.restype = ctypes.c_int
_lib.vd_get_batch.argtypes = [
    ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_long),
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_ubyte),
]
_lib.vd_pool_create.restype = ctypes.c_void_p
_lib.vd_pool_create.argtypes = [ctypes.c_int]
_lib.vd_pool_destroy.argtypes = [ctypes.c_void_p]
_lib.vd_pool_submit.restype = ctypes.c_long
_lib.vd_pool_submit.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
]
_lib.vd_pool_submit_scaled.restype = ctypes.c_long
_lib.vd_pool_submit_scaled.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ctypes.c_int, ctypes.c_int,
]
_lib.vd_open_scaled.restype = ctypes.c_void_p
_lib.vd_open_scaled.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
_lib.vd_pool_fetch.restype = ctypes.c_int
_lib.vd_pool_fetch.argtypes = [
    ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_ubyte),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]
_lib.vd_pool_dims.restype = ctypes.c_int
_lib.vd_pool_dims.argtypes = [
    ctypes.c_void_p, ctypes.c_long,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]


class NativeVideo:
    def __init__(self, path: str):
        self._h = _lib.vd_open(path.encode())
        if not self._h:
            raise IOError(f"native decoder cannot open {path}")
        self.num_frames = int(_lib.vd_num_frames(self._h))
        self.fps = float(_lib.vd_fps(self._h))
        self.width = int(_lib.vd_width(self._h))
        self.height = int(_lib.vd_height(self._h))

    def get_batch(self, indices) -> np.ndarray:
        n = len(indices)
        idx = (ctypes.c_long * n)(*[int(i) for i in indices])
        out = np.empty((n, self.height, self.width, 3), np.uint8)
        ret = _lib.vd_get_batch(
            self._h, idx, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        )
        if ret != 0:
            raise IOError(f"native decode failed ({ret})")
        return out

    def close(self):
        if getattr(self, "_h", None):
            _lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass  # interpreter teardown


class DecodePool:
    """Multi-threaded prefetching decoder (the decord-replacement hot path)."""

    def __init__(self, n_threads: int = 4):
        self._p = _lib.vd_pool_create(n_threads)

    def submit(self, path: str, indices, target_hw=None) -> int:
        """target_hw=(H, W): decode pre-scaled (aspect-preserving, pre-crop
        dims of resize_center_crop) inside the GIL-free pool thread."""
        n = len(indices)
        idx = (ctypes.c_long * n)(*[int(i) for i in indices])
        if target_hw is not None:
            return int(_lib.vd_pool_submit_scaled(
                self._p, path.encode(), idx, n, int(target_hw[0]), int(target_hw[1])
            ))
        return int(_lib.vd_pool_submit(self._p, path.encode(), idx, n))

    def fetch(self, ticket: int, n_frames: int) -> np.ndarray:
        """Block until the job completes; returns (n_frames, H, W, 3) uint8.

        Dims come from the decoded job itself (vd_pool_dims), so the buffer is
        always sized correctly for clips of any resolution.
        """
        h = ctypes.c_int()
        w = ctypes.c_int()
        ret = _lib.vd_pool_dims(self._p, ticket, ctypes.byref(h), ctypes.byref(w))
        if ret != 0:
            raise IOError(f"pool decode failed ({ret})")
        out = np.empty((n_frames, h.value, w.value, 3), np.uint8)
        ret = _lib.vd_pool_fetch(
            self._p, ticket, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.byref(h), ctypes.byref(w),
        )
        if ret != 0:
            raise IOError(f"pool decode failed ({ret})")
        return out

    def close(self):
        if self._p:
            _lib.vd_pool_destroy(self._p)
            self._p = None


def open(path: str) -> NativeVideo:  # noqa: A001 — matches video_io's probe
    return NativeVideo(path)
