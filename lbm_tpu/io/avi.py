"""ctypes binding for the native uncompressed-AVI writer (native/aviwriter.cpp).

Builds the shared library on first use (g++ is part of the toolchain); if
that fails the caller falls back to the pure-Python GIF writer in video.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaviwriter.so"))

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.avi_open.restype = ctypes.c_void_p
        lib.avi_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                 ctypes.c_uint32, ctypes.c_uint32]
        lib.avi_write_frame.restype = ctypes.c_int
        lib.avi_write_frame.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.avi_close.restype = ctypes.c_int
        lib.avi_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


class AviWriter:
    """Streaming RGB24 AVI writer backed by the native library."""

    def __init__(self, path: str, width: int, height: int, fps: int = 1):
        lib = _load()
        if lib is None:
            raise RuntimeError("native aviwriter unavailable")
        self._lib = lib
        self._handle = lib.avi_open(path.encode(), width, height, fps)
        if not self._handle:
            raise OSError(f"cannot open {path}")
        self.width, self.height = width, height

    def write(self, frame: np.ndarray) -> None:
        """frame: (H, W, 3) uint8 RGB, top-down."""
        assert frame.shape == (self.height, self.width, 3), frame.shape
        assert frame.dtype == np.uint8
        buf = np.ascontiguousarray(frame)
        rc = self._lib.avi_write_frame(
            self._handle, buf.ctypes.data_as(ctypes.c_char_p))
        if rc:
            raise OSError("avi_write_frame failed")

    def close(self) -> None:
        if self._handle:
            self._lib.avi_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
