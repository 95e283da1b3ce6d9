"""Native (C++) runtime components, bound via ctypes.

The reference's runtime-side native code is its synchronous binary Logger
(/root/reference/include/utils.h:45-79).  Here the equivalent is an
ASYNCHRONOUS C++ logger (logger.cpp): host-side writes stage into a ring
buffer flushed by a background thread, so the control loop feeding the
TPU never blocks on disk.

The shared library is built on first use with g++ (see build.sh); if the
toolchain is unavailable the callers fall back to the pure-numpy writer in
utils/gamelog.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librobogame_native.so")
_lib = None
_lock = threading.Lock()


def _load():
    """Load (building if necessary) the native library; None on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                               check=True, capture_output=True)
            except (OSError, subprocess.CalledProcessError):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.rg_logger_open.restype = ctypes.c_void_p
        lib.rg_logger_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.rg_logger_write.restype = ctypes.c_int
        lib.rg_logger_write.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_double),
                                        ctypes.c_uint64]
        lib.rg_logger_flush.argtypes = [ctypes.c_void_p]
        lib.rg_logger_close.argtypes = [ctypes.c_void_p]
        lib.rg_log_read.restype = ctypes.c_int64
        lib.rg_log_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_double),
                                    ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeLogger:
    """Async append-only binary logger over the C++ library.

    Raises OSError if the native library cannot be built/loaded; callers
    that want a fallback should check :func:`available` first."""

    def __init__(self, path: str, buf_doubles: int = 1 << 16):
        lib = _load()
        if lib is None:
            raise OSError("native logger library unavailable")
        self._lib = lib
        self._h = lib.rg_logger_open(path.encode(), buf_doubles)
        if not self._h:
            raise OSError(f"cannot open log file {path}")

    def write(self, arr) -> None:
        a = np.ascontiguousarray(arr, dtype=np.float64).reshape(-1)
        p = a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if self._lib.rg_logger_write(self._h, p, a.size) != 0:
            raise OSError("native logger write failed")

    def flush(self) -> None:
        if self._h:
            self._lib.rg_logger_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.rg_logger_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
