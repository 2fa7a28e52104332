"""Native (C++) runtime components, bound via ctypes.

Provides the reference's C++-runtime equivalents: asynchronous frame
writing (GSDDumpWriter role) and 3D Hilbert-curve indexing (SFCPackUpdater
role).  The shared library builds on demand with g++; everything degrades
gracefully to the pure-Python paths when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, 'libhoomd_tpu_native.so')
_SRC = os.path.join(_HERE, 'native.cpp')
_lock = threading.Lock()
_lib = None
_tried = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
                     '-pthread', _SRC, '-o', _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.ht_hilbert3.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint64)]
            lib.ht_writer_open.restype = ctypes.c_void_p
            lib.ht_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.ht_writer_enqueue.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int]
            lib.ht_writer_pending.restype = ctypes.c_int64
            lib.ht_writer_pending.argtypes = [ctypes.c_void_p]
            lib.ht_writer_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def hilbert3(frac, bits=10):
    """Hilbert indices for fractional coordinates (n,3) in [0,1);
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(frac, dtype=np.float64)
    out = np.empty(len(f), dtype=np.uint64)
    lib.ht_hilbert3(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(f)), ctypes.c_int(bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


class AsyncWriter:
    """Background-thread frame writer; falls back to synchronous writes
    when the native library is unavailable."""

    def __init__(self, magic: bytes):
        self.magic = magic
        lib = get_lib()
        self._lib = lib
        self._h = (lib.ht_writer_open(magic, len(magic))
                   if lib is not None else None)

    def enqueue(self, path: str, blob: bytes, truncate: bool):
        if self._h is not None:
            buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
            self._lib.ht_writer_enqueue(
                self._h, path.encode(), buf, len(blob),
                1 if truncate else 0)
        else:
            import struct
            mode = 'wb' if truncate else 'ab'
            with open(path, mode) as f:
                if truncate:
                    f.write(self.magic)
                f.write(struct.pack('<Q', len(blob)))
                f.write(blob)

    def flush(self, timeout=30.0):
        if self._h is None:
            return
        import time
        t0 = time.time()
        while self._lib.ht_writer_pending(self._h) > 0 \
                and time.time() - t0 < timeout:
            time.sleep(0.002)

    def close(self):
        if self._h is not None:
            self._lib.ht_writer_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
