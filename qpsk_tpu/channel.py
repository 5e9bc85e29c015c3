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
import numpy as np

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


def tone_pcm(pcm: jnp.ndarray, freq_hz: float, level_db: float,
             signal_power: float, fs: float = 9600.0,
             pcm_scale: float = 16384.0, phase: float = 0.0) -> jnp.ndarray:
    """Add a CW interferer tone to int16 PCM.

    ``level_db`` is the tone's power relative to the signal's analog power
    ``signal_power`` (0 dB = equal power).  A strong in-band CW line is
    the canonical acquisition-hostile impairment: its M-power harmonics
    park deterministic peaks on the spectral estimator that no averaging
    removes (ops/acquire.py's spur problem made arbitrarily bad), which
    is the scenario the acquisition sweep fallback exists for.
    """
    n = pcm.shape[-1]
    amp = float(np.sqrt(2.0 * signal_power * 10.0 ** (level_db / 10.0)))
    t = jnp.arange(n, dtype=jnp.float32)
    tone = amp * jnp.cos(
        jnp.float32(2.0 * np.pi * freq_hz / fs) * t + jnp.float32(phase))
    y = pcm.astype(jnp.float32) + tone * jnp.float32(pcm_scale)
    return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)


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


def clock_offset_pcm(pcm: jnp.ndarray, ppm: float,
                     frac_offset: float = 0.0) -> jnp.ndarray:
    """Sample-clock mismatch between TX and RX (every real sound-card link
    has one): resample int16 PCM at rate (1 + ppm) with a fractional start
    offset, via Catmull-Rom cubic interpolation.

    This is the impairment ``timing_mode="tracking"`` (the frame-rate
    timing PLL, ops/timing.py) exists for — the feedforward estimators
    re-measure the drifting phase per frame, the tracked loop follows the
    *rate*.  Output is ``8 + max(0, ceil(n*ppm))`` samples shorter than the
    input (interpolation margin plus the extra span a positive ppm reads
    past the nominal end; static shape).  Gathers are fine here: channel
    models are test/simulation stimulus, not the modem hot path.
    """
    x = pcm.astype(jnp.float32)
    n = x.shape[-1]
    # margin: interpolation needs i+2 in range, and positive ppm drifts
    # the read position past the nominal end by n*ppm samples
    out_n = n - 8 - max(0, int(math.ceil(n * ppm)))
    t = (jnp.float32(frac_offset) + 1.0
         + jnp.arange(out_n, dtype=jnp.float32) * jnp.float32(1.0 + ppm))
    i = jnp.clip(t.astype(jnp.int32), 1, n - 3)
    mu = t - i.astype(jnp.float32)
    xm1 = jnp.take(x, i - 1, axis=-1)
    x0 = jnp.take(x, i, axis=-1)
    x1 = jnp.take(x, i + 1, axis=-1)
    x2 = jnp.take(x, i + 2, axis=-1)
    # Catmull-Rom (the same Farrow structure as decimate_fractional)
    a = 0.5 * (-xm1 + 3.0 * x0 - 3.0 * x1 + x2)
    b = xm1 - 2.5 * x0 + 2.0 * x1 - 0.5 * x2
    c = 0.5 * (x1 - xm1)
    y = ((a * mu + b) * mu + c) * mu + x0
    return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)


def phase_noise_pcm(key: jax.Array, pcm: jnp.ndarray, linewidth_hz: float,
                    fs: float) -> jnp.ndarray:
    """Oscillator phase noise on passband PCM: rotate the analytic signal
    by a Wiener phase walk with the given Lorentzian linewidth
    (per-sample increment variance 2*pi*linewidth/fs), take the real part.

    The analytic signal comes from an FFT Hilbert transform over the whole
    stream (one-shot simulation stimulus — O(n log n), not a streaming
    op).  This is the one deliberate exception to the split-plane-CF32
    device invariant: a complex64 FFT pair on test stimulus, never in the
    modem path (CLAUDE.md "Invariants").  linewidth 0 returns the input
    unchanged.  This is the impairment
    the gear-shift Costas loop's *tracking* bandwidth trades against: too
    narrow and the loop cannot follow the walk, too wide and it passes
    noise (README.md:12's hand-tuning tension, made measurable).
    """
    if linewidth_hz <= 0.0:
        return pcm
    x = pcm.astype(jnp.float32)
    n = x.shape[-1]
    xf = jnp.fft.fft(x.astype(jnp.complex64), axis=-1)
    h = np.zeros(n, np.float32)
    h[0] = 1.0
    if n % 2 == 0:
        h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[1:(n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(xf * jnp.asarray(h), axis=-1)
    sigma = math.sqrt(TAU * linewidth_hz / fs)
    dphi = sigma * jax.random.normal(key, x.shape, jnp.float32)
    phi = jnp.cumsum(dphi, axis=-1)
    y = (analytic.real * jnp.cos(phi) - analytic.imag * jnp.sin(phi))
    return jnp.clip(jnp.round(y), -32768, 32767).astype(jnp.int16)


def impulse_noise_pcm(key: jax.Array, pcm: jnp.ndarray, rate_hz: float,
                      fs: float, amp: float = 1.0,
                      burst_samples: int = 8) -> jnp.ndarray:
    """Impulsive interference on passband PCM — the classic audio-link
    impairment AWGN doesn't model (ignition noise, static crashes,
    switching clicks): Poisson-arriving bursts of ``burst_samples`` of
    full-scale-times-``amp`` noise at ``rate_hz`` events/second.

    Each burst wipes the samples it lands on; a CRC-checked packet layer
    loses whole packets while FEC rides through (the interleaver spreads
    one burst's symbols across the codeword — exactly what the
    golden-prime interleaver is for).
    """
    x = pcm.astype(jnp.float32)
    n = x.shape[-1]
    kg, kn = jax.random.split(key)
    p_event = jnp.float32(rate_hz / fs)
    hit = jax.random.uniform(kg, x.shape, jnp.float32) < p_event
    # widen each event to a burst: max over a sliding window via repeated
    # shifted ORs (burst_samples is small and static)
    mask = hit
    for d in range(1, min(burst_samples, n)):
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (d,), bool), hit[..., :n - d]],
            axis=-1)
        mask = mask | shifted
    noise = jax.random.normal(kn, x.shape, jnp.float32) * jnp.float32(
        32767.0 * amp)
    y = jnp.where(mask, noise, x)
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
