"""ctypes loader for the native IO/runtime library (qpsk_io.cc).

Builds ``libqpsk_io.so`` from the shipped C++ source on first use (g++,
-O2), caching the artifact next to the source keyed by an mtime check.
No pybind11 dependency — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "qpsk_io.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libqpsk_io.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library; thread-safe."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)

        c = ctypes
        i16p = c.POINTER(c.c_int16)
        u8p = c.POINTER(c.c_uint8)
        i32p = c.POINTER(c.c_int32)

        lib.spool_open.restype = c.c_void_p
        lib.spool_open.argtypes = [c.c_char_p, c.c_char_p]
        lib.spool_read.restype = c.c_int64
        lib.spool_read.argtypes = [c.c_void_p, i16p, c.c_int64, c.c_int64]
        lib.spool_write.restype = c.c_int64
        lib.spool_write.argtypes = [c.c_void_p, i16p, c.c_int64, c.c_int64]
        lib.spool_close.argtypes = [c.c_void_p]

        lib.wav_write.restype = c.c_int
        lib.wav_write.argtypes = [c.c_char_p, i16p, c.c_int64, c.c_int32]
        lib.wav_read.restype = c.c_int64
        lib.wav_read.argtypes = [c.c_char_p, i16p, c.c_int64, i32p]

        lib.ring_create.restype = c.c_void_p
        lib.ring_create.argtypes = [c.c_int64]
        lib.ring_push.restype = c.c_int64
        lib.ring_push.argtypes = [c.c_void_p, i16p, c.c_int64]
        lib.ring_pop.restype = c.c_int64
        lib.ring_pop.argtypes = [c.c_void_p, i16p, c.c_int64]
        lib.ring_available.restype = c.c_int64
        lib.ring_available.argtypes = [c.c_void_p]
        lib.ring_destroy.argtypes = [c.c_void_p]

        lib.crc16_native.restype = c.c_uint16
        lib.crc16_native.argtypes = [u8p, c.c_int64]
        lib.scramble_keystream.argtypes = [c.c_uint16, u8p, c.c_int64]
        lib.scramble_bits_native.argtypes = [c.c_uint16, u8p, c.c_int64]
        lib.interleave_permutation_native.argtypes = [c.c_int64, i32p]
        lib.interleave_bits_native.restype = c.c_int
        lib.interleave_bits_native.argtypes = [u8p, c.c_int64, c.c_int]

        _lib = lib
        return lib
