"""Fractional (interpolating) timing mode: robust to off-grid symbol clocks.

A half-sample delay is the worst case for integer-phase decimation (the
best integer pick is 0.5 samples off the symbol peak).  The fractional
mode interpolates at the Oerder&Meyr estimate and should hold EVM close to
the on-grid case.
"""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.metrics import evm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.packet import PacketConfig, assemble_packet


def _tx_pcm(nframes=30, seed=0):
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)
    return np.asarray(pcm).reshape(-1).astype(np.float64)


def _frac_delay(x, delay):
    """Fractional-delay via FFT phase ramp (test-side ideal resampler)."""
    n = x.size
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n)
    y = np.fft.irfft(X * np.exp(-2j * np.pi * f * delay), n)
    return y


def _demod_evm(pcm_f64, timing_mode, skip=10):
    cfg = ModemConfig(timing_mode=timing_mode)
    pcm = jnp.asarray(np.clip(np.round(pcm_f64), -32768, 32767).astype(np.int16))
    pcm = pcm.reshape(-1, cfg.frame_size)
    _, out = rx_stream(cfg, rx_init(cfg), pcm)
    m = evm(CF32(out.symbols.re[skip:], out.symbols.im[skip:]))
    return float(jnp.mean(m.evm_rms))


def test_fractional_equals_power_on_grid():
    pcm = _tx_pcm()
    e_pow = _demod_evm(pcm, "power")
    e_frac = _demod_evm(pcm, "fractional")
    assert e_frac < e_pow + 0.02, (e_frac, e_pow)


def test_fractional_wins_off_grid():
    pcm = _frac_delay(_tx_pcm(), 0.5)   # worst case for integer picks
    e_pow = _demod_evm(pcm, "power")
    e_frac = _demod_evm(pcm, "fractional")
    # integer-phase decimation samples 0.5 off the peak -> heavy ISI;
    # interpolation should roughly halve the EVM (or better)
    assert e_frac < 0.6 * e_pow, (e_frac, e_pow)
    assert e_frac < 0.15, e_frac


def test_fractional_tracks_quarter_sample():
    pcm = _frac_delay(_tx_pcm(seed=1), 0.25)
    e_frac = _demod_evm(pcm, "fractional")
    assert e_frac < 0.12, e_frac
