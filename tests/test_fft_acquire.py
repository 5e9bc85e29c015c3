"""FFT convention KATs (vs algorithms/fft.c) and acquisition accuracy."""

import math

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops import acquire, fft as fft_ops
from qpsk_tpu.ops.cplx import CF32, from_complex, to_complex

# fftn(ramp, 8) from the compiled reference (forward divides by N,
# fft.c:117-119); input x[i] = i + 0.5j*(7-i).
FFTN8_RAMP = np.array([
    (3.500000000, 1.750000000), (0.103553391, 1.457106781),
    (-0.250000000, 0.750000000), (-0.396446609, 0.457106781),
    (-0.500000000, 0.250000000), (-0.603553391, 0.042893219),
    (-0.750000000, -0.250000000), (-1.103553391, -0.957106781)])


def test_fft_impulse_convention():
    x = from_complex(np.eye(1, 8, 0).ravel().astype(np.complex64))
    y = to_complex(fft_ops.fft(x))
    np.testing.assert_allclose(y, np.full(8, 0.125 + 0j), atol=1e-6)


def test_fft_ramp_kat():
    x = np.arange(8) + 0.5j * (7 - np.arange(8))
    y = to_complex(fft_ops.fft(from_complex(x)))
    want = FFTN8_RAMP[:, 0] + 1j * FFTN8_RAMP[:, 1]
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_ifft_unnormalized_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 64)) + 1j * rng.normal(size=(3, 64))).astype(np.complex64)
    z = to_complex(fft_ops.ifft(fft_ops.fft(from_complex(x))))
    np.testing.assert_allclose(z, x, atol=1e-4)


def test_fft_matches_numpy_convention():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    y = to_complex(fft_ops.fft(from_complex(x)))
    np.testing.assert_allclose(y, fft_ops.fft_np(x), atol=1e-4)


def test_acquire_freq_offset():
    """4th-power estimator recovers the carrier offset of random QPSK
    baseband samples to sub-Hz at fs=9600."""
    fs = 9600.0
    rng = np.random.default_rng(2)
    nsym = 256
    cycles = 4
    # random QPSK symbols, rectangular pulse (good enough for the estimator)
    sym = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, nsym)))
    base = np.repeat(sym, cycles)
    for f0 in (50.0, -120.0, 333.0):
        rot = base * np.exp(2j * np.pi * f0 * np.arange(base.size) / fs)
        est = float(acquire.acquire_freq_hz(from_complex(rot), fs, nfft=512))
        assert abs(est - f0) < 2.0, (f0, est)


def test_acquire_batched():
    fs = 9600.0
    rng = np.random.default_rng(3)
    sym = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, (2, 256))))
    base = np.repeat(sym, 4, axis=-1)
    f0 = np.array([75.0, -200.0])
    rot = base * np.exp(2j * np.pi * f0[:, None] * np.arange(base.shape[-1]) / fs)
    est = np.asarray(acquire.acquire_freq_hz(from_complex(rot), fs, nfft=512))
    np.testing.assert_allclose(est, f0, atol=2.0)
