"""BASELINE config #2: 1200-baud mode, carrier offset + Doppler ramp, FFT
acquisition feeding the Costas loop, loop-bandwidth sweep TAU/100..TAU/200."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.metrics import evm
from qpsk_tpu.modem import rx_acquire_hz, rx_stream, tx_stream
from qpsk_tpu.ops.acquire import hz_to_costas_freq
from qpsk_tpu.ops.cplx import CF32

TAU = 2 * math.pi


def _link(cfg, nframes, offset_hz, doppler=0.0, seed=0, acquire=True):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(
        0, 2, (nframes, 2 * cfg.symbols_per_frame), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), bits, tx_offset_hz=offset_hz,
                       doppler_hz_per_s=doppler)
    acq = 0.0
    if acquire:
        est = rx_acquire_hz(cfg, pcm)
        acq = hz_to_costas_freq(est, cfg.rs)
    state = rx_init(cfg, acq_freq=acq)
    _, out = rx_stream(cfg, state, pcm)
    return pcm, out, (float(est) if acquire else None)


def test_acquisition_estimates_offset_2400():
    cfg = ModemConfig()
    _, out, est = _link(cfg, 20, offset_hz=137.0)
    assert abs(est - 137.0) < 5.0, est
    assert abs(float(out.freq_hz[-1]) - 137.0) < 5.0


def test_acquisition_1200_baud():
    cfg = ModemConfig(rs=1200.0)
    assert cfg.cycles == 8
    _, out, est = _link(cfg, 20, offset_hz=-60.0)
    assert abs(est + 60.0) < 5.0, est
    m = evm(CF32(out.symbols.re[10:], out.symbols.im[10:]))
    assert float(jnp.mean(m.evm_rms)) < 0.25


def test_warm_start_beats_cold_start():
    """With a large offset, the FFT-seeded loop locks where the cold loop
    hasn't converged yet in the same number of frames."""
    cfg = ModemConfig()
    nf = 12
    _, out_w, est = _link(cfg, nf, offset_hz=200.0, acquire=True)
    _, out_c, _ = _link(cfg, nf, offset_hz=200.0, acquire=False)
    err_w = abs(float(out_w.freq_hz[-1]) - 200.0)
    err_c = abs(float(out_c.freq_hz[-1]) - 200.0)
    assert err_w < 10.0, err_w
    assert err_w < err_c, (err_w, err_c)


@pytest.mark.parametrize("bw_div", [100, 141, 200])
def test_doppler_ramp_tracking_bw_sweep(bw_div):
    """Doppler ramp: f(t) = 40 Hz + 8 Hz/s. Every loop bandwidth in the
    reference's working range (README.md:12) must track the ramp."""
    cfg = ModemConfig(loop_bw=TAU / bw_div)
    nframes = 40
    _, out, est = _link(cfg, nframes, offset_hz=40.0, doppler=8.0, seed=1)
    assert abs(est - 40.0) < 6.0, est   # acquisition sees the initial offset
    t_end = nframes * cfg.frame_size / cfg.fs
    f_end = 40.0 + 8.0 * t_end
    tail = float(jnp.mean(out.freq_hz[-5:]))
    assert abs(tail - f_end) < 8.0, (tail, f_end)
    # the loop's tracked trajectory should slope upward with the ramp
    head = float(jnp.mean(out.freq_hz[4:9]))
    assert tail > head


def test_tx_stream_matches_tx_frame_chain():
    """tx_stream (no chirp) chains bit-identically with per-frame TX."""
    from qpsk_tpu.modem import tx_bits_frame

    cfg = ModemConfig()
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (6, 256), dtype=np.int32))
    _, pcm_fused = tx_stream(cfg, tx_init(cfg), bits, tx_offset_hz=50.0)

    st = tx_init(cfg)
    frames = []
    for k in range(6):
        st, p = tx_bits_frame(cfg, st, bits[k], tx_offset_hz=50.0)
        frames.append(np.asarray(p))
    chain = np.stack(frames)
    d = np.abs(pcm_fused.astype(np.int32) - chain.astype(np.int32))
    assert d.max() <= 1, d.max()
