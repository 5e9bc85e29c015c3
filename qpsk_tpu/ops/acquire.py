"""FFT-based coarse carrier acquisition (capability upgrade over the
reference).

The reference Costas loop cold-starts at freq=0 and must be hand-tuned to
pull in the +50 Hz offset (README.md:12, qpsk.c:302).  Here a classic
4th-power spectral estimator seeds the loop: raising QPSK to the 4th power
strips the modulation, leaving a tone at 4·Δf whose FFT peak (with parabolic
interpolation between bins) gives Δf to a fraction of a bin.  The FFT is the
matmul DFT (qpsk_tpu.ops.fft), so the whole estimator is matmuls +
reductions — no recurrence, arbitrary batch axes.

Works on matched-filtered baseband *samples* (before decimation): at fs with
offset f, the 4th-power tone sits at 4f (wrapped into [-fs/2, fs/2)), so the
ESTIMATOR is unambiguous for |f| < fs/8 = 1200 Hz.  The CHAIN's usable lock
range is narrower: the matched filter is fixed at the nominal carrier, so a
large offset parks the signal on the filter skirt before acquisition ever
sees it.  Measured end-to-end at 10 dB (tools/run_lock_range.py,
docs/lock_range.jsonl): cold-start decodes to ±150 Hz, FFT-seeded ≥95%
to ±300 Hz — 2x the cold range and 6x the reference's demonstrated +50 Hz
(qpsk.c:320), against an audio channel whose own ~[300, 3300] Hz passband
makes larger errors physically out of spec anyway.
"""

from __future__ import annotations

import jax.numpy as jnp

from qpsk_tpu.ops import fft as fft_ops
from qpsk_tpu.ops.cplx import CF32, cmul


def quadruple(x: CF32) -> CF32:
    """z^4 via two squarings (exact split-plane arithmetic)."""
    z2 = cmul(x, x)
    return cmul(z2, z2)


def _mpower(x: CF32, power: int) -> CF32:
    """z^power by repeated squaring (power in {2, 4, 8}: the modulation
    strip orders of the family — BPSK 2, QPSK/16QAM 4, 8PSK 8)."""
    assert power in (2, 4, 8), power
    z = cmul(x, x)
    if power >= 4:
        z = cmul(z, z)
    if power == 8:
        z = cmul(z, z)
    return z


def acquire_freq_hz(x: CF32, fs: float, nfft: int = 512,
                    power: int = 4, avg: int = 1) -> jnp.ndarray:
    """Estimate the carrier offset (Hz) of M-PSK/QAM baseband samples ``x``
    (..., n >= avg*nfft).  ``power`` is the modulation-strip order (see
    ``modfam.ACQUIRE_POWER``; default 4 = QPSK).  Returns (...,) float32.

    ``avg`` > 1 Welch-averages the M-power PSD over ``avg`` consecutive
    nfft blocks before the peak pick: the high-order strips (8PSK's 8th
    power especially) raise noise and ISI cross-terms into spurious
    peaks — image at -M·Δf, symbol-rate harmonics — that on single
    blocks occasionally out-peak the carrier line at operating SNR
    (measured: ~1/3 of (seed, SNR) draws mis-acquired at 10-18 dB;
    avg=8 recovered every one).  Averaging |FFT|^2 keeps the
    deterministic line and drops the noise variance by avg×.
    """
    seg = CF32(x.re[..., :avg * nfft].reshape(x.re.shape[:-1]
                                              + (avg, nfft)),
               x.im[..., :avg * nfft].reshape(x.im.shape[:-1]
                                              + (avg, nfft)))
    z = _mpower(seg, power)
    spec = fft_ops.fft(z)
    psd = jnp.mean(spec.re * spec.re + spec.im * spec.im,
                   axis=-2)                          # (..., nfft)
    k = jnp.argmax(psd, axis=-1)

    # Parabolic interpolation around the peak (cyclic neighbors).
    km = jnp.mod(k - 1, nfft)
    kp = jnp.mod(k + 1, nfft)
    pm = jnp.take_along_axis(psd, km[..., None], axis=-1)[..., 0]
    p0 = jnp.take_along_axis(psd, k[..., None], axis=-1)[..., 0]
    pp = jnp.take_along_axis(psd, kp[..., None], axis=-1)[..., 0]
    denom = pm - 2.0 * p0 + pp
    delta = jnp.where(jnp.abs(denom) > 1e-20,
                      0.5 * (pm - pp) / denom, 0.0)
    kf = k.astype(jnp.float32) + delta
    # Map bin to signed frequency, then undo the M-power.
    kf = jnp.where(kf > nfft / 2, kf - nfft, kf)
    return kf * jnp.float32(fs / nfft) / jnp.float32(power)


def _peak_hz(psd: jnp.ndarray, nfft: int, fs: float, power: int,
             interp_psd: jnp.ndarray | None = None,
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(offset_hz, peak_bin) of the PSD argmax with parabolic interp.

    ``interp_psd`` (default: ``psd`` itself) supplies the neighbor values
    for the parabolic fit.  The candidate search masks a guard window
    around earlier picks before re-running the argmax; interpolating
    against that MASKED copy would read a zeroed km/kp neighbor whenever a
    runner-up line sits adjacent to a guard edge, biasing the candidate's
    offset by up to ~half a bin — so it passes the original PSD here."""
    if interp_psd is None:
        interp_psd = psd
    k = jnp.argmax(psd, axis=-1)
    km = jnp.mod(k - 1, nfft)
    kp = jnp.mod(k + 1, nfft)
    pm = jnp.take_along_axis(interp_psd, km[..., None], axis=-1)[..., 0]
    p0 = jnp.take_along_axis(interp_psd, k[..., None], axis=-1)[..., 0]
    pp = jnp.take_along_axis(interp_psd, kp[..., None], axis=-1)[..., 0]
    denom = pm - 2.0 * p0 + pp
    delta = jnp.where(jnp.abs(denom) > 1e-20,
                      0.5 * (pm - pp) / denom, 0.0)
    # At a true local max (pm <= p0 >= pp) the fit is bounded to half a
    # bin automatically, but against the ORIGINAL psd a runner-up
    # adjacent to a stronger line's skirt can have a neighbor above its
    # own peak, flipping the parabola and making delta arbitrarily large
    # — clamp to the half-bin the interpolation is meant to refine.
    delta = jnp.clip(delta, -0.5, 0.5)
    kf = k.astype(jnp.float32) + delta
    kf = jnp.where(kf > nfft / 2, kf - nfft, kf)
    return kf * jnp.float32(fs / nfft) / jnp.float32(power), k


def acquire_freq_candidates(x: CF32, fs: float, nfft: int = 512,
                            power: int = 4, avg: int = 1,
                            ncand: int = 2,
                            guard_bins: int = 16) -> jnp.ndarray:
    """Top-``ncand`` carrier-offset CANDIDATES (..., ncand) in Hz,
    strongest first.

    Why candidates: the M-power spectrum carries DETERMINISTIC spurs at
    ``M*Δf ± k*rs`` (ISI cross-terms sampled at the symbol spacing) that
    Welch averaging cannot suppress, and at some offsets the spur
    out-peaks the carrier line itself (measured for 8PSK at
    +200..+300 Hz: the spur at 8Δf − rs, or at DC when 8Δf = rs, wins on
    ~1/3 of draws — docs/lock_range_8psk.jsonl's asymmetry).  No PSD-side
    statistic can break the tie reliably — the true line and its
    harmonic displacements are all deterministic — but the stack's own
    CRC-scored sync hunt can: consumers try candidate 0 and fall back to
    candidate 1 when no sync establishes (the streaming runtime does this
    automatically; a single-estimate receiver would re-acquire the SAME
    wrong peak forever).  Each candidate is peak-picked with the same
    parabolic interpolation as ``acquire_freq_hz``; ``guard_bins``
    suppresses a cyclic window around earlier picks so candidates are
    distinct lines, not adjacent bins of one peak.
    """
    seg = CF32(x.re[..., :avg * nfft].reshape(x.re.shape[:-1]
                                              + (avg, nfft)),
               x.im[..., :avg * nfft].reshape(x.im.shape[:-1]
                                              + (avg, nfft)))
    z = _mpower(seg, power)
    spec = fft_ops.fft(z)
    psd = jnp.mean(spec.re * spec.re + spec.im * spec.im, axis=-2)
    bins = jnp.arange(nfft, dtype=jnp.int32)
    cands = []
    masked = psd   # argmax runs on the masked copy, interp on the original
    for _ in range(ncand):
        f_hz, k = _peak_hz(masked, nfft, fs, power, interp_psd=psd)
        cands.append(f_hz)
        d = jnp.abs(jnp.mod(bins - k[..., None] + nfft // 2, nfft)
                    - nfft // 2)
        masked = jnp.where(d <= guard_bins, 0.0, masked)
    return jnp.stack(cands, axis=-1)


def sweep_candidates_hz(max_hz: float = 375.0,
                        step_hz: float = 75.0) -> "np.ndarray":
    """Static acquisition-seed sweep grid ``[0, +s, -s, +2s, -2s, ...]`` —
    the fallback when spectral acquisition itself is degraded (a strong
    interferer parked on the M-power line, or SNR below the acquisition
    floor): no PSD peak can point at the carrier, but a seed within the
    loop's cold pull-in of the true offset still decodes, and the stack's
    CRC-scored sync hunt tells right seeds from wrong ones.  Stepping the
    seed across the band plan's offset range therefore recovers any
    carrier the spectrum can't find, at the cost of one hunt window per
    step.  ``step_hz`` defaults to 75: the generic family's measured cold
    pull-in is ~±50 Hz (docs/lock_range_{8psk,16qam}.jsonl), so the worst
    residual after the best sweep seed is 37.5 Hz.  ``max_hz`` defaults
    to 375 — the edge of the decodable band (measured: 8PSK at ±375
    decodes 1.0 CRC from a seed within 25 Hz; at ±400 the matched-filter
    skirt kills decode with a PERFECT seed, so wider grids buy nothing
    at this band plan).  Consumers walk the grid AFTER the FFT
    candidates reject (StreamDemodulator's candidate rotation;
    tools/run_lock_range.py measures the combined behavior).
    """
    import numpy as np
    ks = int(max_hz / step_hz)
    grid = [0.0]
    for k in range(1, ks + 1):
        grid += [k * step_hz, -k * step_hz]
    return np.asarray(grid, np.float32)


def hz_to_costas_freq(f_hz: jnp.ndarray, rs: float) -> jnp.ndarray:
    """Hz -> Costas loop frequency units (rad/symbol), inverting the
    readback ``f = freq * RS / TAU`` (qpsk.c:217)."""
    import math
    return f_hz * jnp.float32(2.0 * math.pi / rs)
