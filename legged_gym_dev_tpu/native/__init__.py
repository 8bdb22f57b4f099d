"""Native (C++) runtime components, driven via ctypes.

The compute path of this framework is JAX/XLA (TPU); the host-side runtime
around it — here the tube-training data pipeline — is native C++, mirroring
how the reference delegates its runtime to native dependencies (Isaac Gym's
tensor pipeline, torch's DataLoader). See tube_dataloader.cc.

The shared library is built on demand with g++ (no pip/pybind11 in the
image); ``load_dataloader()`` returns None if no toolchain is available and
callers fall back to the pure-numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtube_dataloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "tube_dataloader.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_dataloader():
    """Return the ctypes-configured native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_DIR, "tube_dataloader.cc"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tdl_open.restype = ctypes.c_void_p
        lib.tdl_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.tdl_rows.restype = ctypes.c_int64
        lib.tdl_rows.argtypes = [ctypes.c_void_p]
        lib.tdl_row_dim.restype = ctypes.c_int
        lib.tdl_row_dim.argtypes = [ctypes.c_void_p]
        lib.tdl_target_dim.restype = ctypes.c_int
        lib.tdl_target_dim.argtypes = [ctypes.c_void_p]
        lib.tdl_start_epoch.restype = None
        lib.tdl_start_epoch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tdl_next_batch.restype = ctypes.c_int
        lib.tdl_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tdl_close.restype = None
        lib.tdl_close.argtypes = [ctypes.c_void_p]
        lib.tdl_error.restype = ctypes.c_char_p
        lib.tdl_error.argtypes = []
        _lib = lib
        return _lib
