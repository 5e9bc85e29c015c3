"""Native streaming IO runtime.

The reference's L5 runtime is blocking C stdio on a raw int16 spool file
(qpsk.c:314-356).  This package is the framework's native equivalent,
implemented in C++ (qpsk_io.cc) behind thin Python wrappers:

* ``SpoolReader`` / ``SpoolWriter`` — framed int16 PCM spool files with the
  reference's short-read-terminates semantics;
* ``read_wav`` / ``write_wav`` — 16-bit mono WAV (the practical container
  for an audio-band modem);
* ``Ring`` — lock-free SPSC int16 ring buffer for real-time capture →
  device pipelines;
* ``native_crc16`` / ``native_scramble_bits`` / ``native_interleave_bits``
  — line-rate host-side twins of the jnp packet ops (bit-for-bit equal,
  asserted by tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from qpsk_tpu.io.native import load


def _i16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class SpoolWriter:
    """Framed int16 PCM writer (the TX side of qpsk.h:14's spool)."""

    def __init__(self, path: str, frame_len: int):
        self._lib = load()
        self._h = self._lib.spool_open(path.encode(), b"wb")
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.frame_len = frame_len

    def write(self, frames: np.ndarray) -> int:
        frames = np.ascontiguousarray(frames, dtype=np.int16)
        assert frames.shape[-1] == self.frame_len, frames.shape
        nf = int(np.prod(frames.shape[:-1])) if frames.ndim > 1 else 1
        return int(self._lib.spool_write(self._h, _i16p(frames),
                                         self.frame_len, nf))

    def close(self):
        if self._h:
            self._lib.spool_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class SpoolReader:
    """Framed int16 PCM reader; iteration ends on short read
    (qpsk.c:348-351 semantics)."""

    def __init__(self, path: str, frame_len: int):
        self._lib = load()
        self._h = self._lib.spool_open(path.encode(), b"rb")
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.frame_len = frame_len

    def read(self, nframes: int) -> np.ndarray:
        buf = np.empty((nframes, self.frame_len), dtype=np.int16)
        got = int(self._lib.spool_read(self._h, _i16p(buf),
                                       self.frame_len, nframes))
        return buf[:got]

    def __iter__(self):
        while True:
            f = self.read(1)
            if f.shape[0] == 0:
                return
            yield f[0]

    def close(self):
        if self._h:
            self._lib.spool_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    samples = np.ascontiguousarray(samples, dtype=np.int16).ravel()
    rc = load().wav_write(path.encode(), _i16p(samples), samples.size,
                          sample_rate)
    if rc != 0:
        raise OSError(f"wav_write failed for {path}")


def read_wav(path: str) -> tuple[np.ndarray, int]:
    lib = load()
    sr = ctypes.c_int32(0)
    n = int(lib.wav_read(path.encode(), None, 0, ctypes.byref(sr)))
    if n < 0:
        raise OSError(f"wav_read failed for {path}")
    buf = np.empty(n, dtype=np.int16)
    got = int(lib.wav_read(path.encode(), _i16p(buf), n, ctypes.byref(sr)))
    return buf[:got], int(sr.value)


class Ring:
    """Lock-free SPSC int16 ring buffer (capacity must be a power of 2)."""

    def __init__(self, capacity: int):
        self._lib = load()
        self._h = self._lib.ring_create(capacity)
        if not self._h:
            raise ValueError("capacity must be a positive power of two")

    def push(self, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, dtype=np.int16).ravel()
        return int(self._lib.ring_push(self._h, _i16p(samples), samples.size))

    def pop(self, n: int) -> np.ndarray:
        buf = np.empty(n, dtype=np.int16)
        got = int(self._lib.ring_pop(self._h, _i16p(buf), n))
        return buf[:got]

    @property
    def available(self) -> int:
        return int(self._lib.ring_available(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ring_destroy(self._h)
            self._h = None


def native_crc16(data: np.ndarray) -> int:
    data = np.ascontiguousarray(data, dtype=np.uint8)
    return int(load().crc16_native(_u8p(data), data.size))


def native_scramble_bits(bits: np.ndarray, seed: int = 0x4A80) -> np.ndarray:
    out = np.ascontiguousarray(bits, dtype=np.uint8).copy()
    load().scramble_bits_native(seed, _u8p(out), out.size)
    return out


def native_interleave_bits(bits: np.ndarray, deinterleave: bool = False
                           ) -> np.ndarray:
    out = np.ascontiguousarray(bits, dtype=np.uint8).copy()
    rc = load().interleave_bits_native(_u8p(out), out.size, int(deinterleave))
    if rc == -2:
        raise ValueError(
            f"interleave of {out.size} bits is not bijective: the saturated "
            f"prime divides nbits (reference defect, interleave.c:52-59) — "
            f"pad or resize the frame")
    if rc != 0:
        raise MemoryError(f"interleave_bits_native failed (rc={rc})")
    return out
