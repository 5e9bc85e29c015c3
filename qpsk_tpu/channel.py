"""Channel models (capability extension — the reference loopback is
noiseless; its only impairment is a +50 Hz TX offset, qpsk.c:320-321).

All models are pure jnp functions over int16 PCM or CF32 baseband, keyed by
explicit JAX PRNG keys so every run is reproducible (unlike the reference's
``srand(time(0))``, qpsk.c:294).  BASELINE configs exercised here: AWGN
(config #1), carrier offset + Doppler ramp (config #2), PER-vs-SNR sweeps
(config #3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from qpsk_tpu.ops.cplx import CF32

TAU = 2.0 * math.pi


def awgn_pcm(key: jax.Array, pcm: jnp.ndarray, snr_db, signal_power: float,
             pcm_scale: float = 16384.0) -> jnp.ndarray:
    """Add real AWGN to int16 PCM at the given SNR (dB).

    ``signal_power`` is the mean power of the *analog* signal (units of the
    float signal before the pcm_scale multiply).  ``snr_db`` may be a scalar
    or broadcast against the leading axes of ``pcm`` (e.g. one SNR per
    channel for a sweep).
    """
    snr_db = jnp.asarray(snr_db, jnp.float32)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    sigma = jnp.sqrt(noise_power)
    while sigma.ndim < pcm.ndim:
        sigma = sigma[..., None]
    noise = jax.random.normal(key, pcm.shape, jnp.float32)
    y = pcm.astype(jnp.float32) + noise * sigma * jnp.float32(pcm_scale)
    return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)


def awgn_baseband(key: jax.Array, x: CF32, snr_db, signal_power: float = 1.0) -> CF32:
    """Complex AWGN on CF32 baseband; noise power split across I/Q."""
    snr_db = jnp.asarray(snr_db, jnp.float32)
    sigma = jnp.sqrt(signal_power / (10.0 ** (snr_db / 10.0)) / 2.0)
    while sigma.ndim < x.re.ndim:
        sigma = sigma[..., None]
    kr, ki = jax.random.split(key)
    return CF32(x.re + sigma * jax.random.normal(kr, x.re.shape, jnp.float32),
                x.im + sigma * jax.random.normal(ki, x.im.shape, jnp.float32))


def multipath_pcm(pcm: jnp.ndarray, paths,
                  pcm_scale: float = 16384.0) -> jnp.ndarray:
    """Static multipath (e.g. two-ray HF/VHF) on int16 passband PCM:
    ``y[n] = sum_d gain_d * x[n - delay_d]``.

    ``paths``: sequence of (delay_samples int >= 0, gain float) — a static
    real FIR channel at passband (each physical ray is a pure delay of the
    real signal).  The time axis is the last; leading axes broadcast.
    Echoes start silent (zero history before sample 0).  Compose with
    ``awgn_pcm`` for a noisy multipath link.  The resulting symbol-level
    ISI is what ``ModemConfig(eq_taps=...)``'s CMA equalizer
    (ops/equalizer.py) removes.
    """
    x = pcm.astype(jnp.float32)
    y = jnp.zeros_like(x)
    for delay, gain in paths:
        d = int(delay)
        assert d >= 0, "acausal path"
        if d == 0:
            y = y + jnp.float32(gain) * x
        else:
            shifted = jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (d,), jnp.float32),
                 x[..., :-d]], axis=-1)
            y = y + jnp.float32(gain) * shifted
    return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)


def doppler_ramp_offset(n: int, f0_hz: float, rate_hz_per_s: float,
                        fs: float) -> jnp.ndarray:
    """Per-sample instantaneous offset f(t) = f0 + rate·t for a Doppler ramp
    (BASELINE config #2).  Returns (n,) float32 Hz."""
    t = jnp.arange(n, dtype=jnp.float32) / jnp.float32(fs)
    return jnp.float32(f0_hz) + jnp.float32(rate_hz_per_s) * t


def apply_doppler_baseband(x: CF32, offset_hz: jnp.ndarray, fs: float) -> CF32:
    """Rotate CF32 baseband by the integrated phase of a time-varying offset."""
    phase = jnp.cumsum(offset_hz, axis=-1) * jnp.float32(TAU / fs)
    c, s = jnp.cos(phase), jnp.sin(phase)
    return CF32(x.re * c - x.im * s, x.re * s + x.im * c)
