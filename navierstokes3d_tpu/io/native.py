"""ctypes bindings for the native I/O runtime (csrc/ns3dio.cpp).

Builds the shared library on first use (g++, cached next to the source).
Falls back silently to the pure-NumPy path in binio.py when the toolchain
is unavailable — `lib()` returns None then.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libns3dio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "ns3dio.cpp")
    if not os.path.exists(src):
        return False
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(src)):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-pthread", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        l.ns3dio_write_f32.argtypes = [ctypes.c_char_p, fp, i64, i64, i64]
        l.ns3dio_write_f32.restype = ctypes.c_int
        l.ns3dio_write_f32_async.argtypes = [ctypes.c_char_p, fp, i64, i64, i64]
        l.ns3dio_write_f32_async.restype = ctypes.c_int
        l.ns3dio_read_f32.argtypes = [ctypes.c_char_p, fp, i64, i64, i64]
        l.ns3dio_read_f32.restype = ctypes.c_int
        l.ns3dio_drain.argtypes = []
        l.ns3dio_drain.restype = None
        l.ns3dio_pending.argtypes = []
        l.ns3dio_pending.restype = i64
        _lib = l
        return _lib


def _as_f32_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def write_f32(path: str, a: np.ndarray, asynchronous: bool = False) -> bool:
    """Write a 3D array in reference .bin format via the native runtime.
    Returns False if the native library is unavailable."""
    l = lib()
    if l is None or a.ndim != 3:
        return False
    buf = _as_f32_c(a)
    fn = l.ns3dio_write_f32_async if asynchronous else l.ns3dio_write_f32
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = fn(path.encode(), ptr, *buf.shape)
    return rc == 0


def read_f32(path: str, shape) -> Optional[np.ndarray]:
    l = lib()
    if l is None or len(shape) != 3:
        return None
    out = np.empty(shape, dtype=np.float32)
    ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = l.ns3dio_read_f32(path.encode(), ptr, *shape)
    return out if rc == 0 else None


def drain():
    """Wait for all in-flight async writes (call before process exit or
    before reading frames back)."""
    l = lib()
    if l is not None:
        l.ns3dio_drain()
