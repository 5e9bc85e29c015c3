"""Polyphase rational resampler (ops/resample.py).

The IO-edge rate converter between sound-card rates (44.1/48 kHz) and the
modem rate (FS=9600, qpsk.h:16).  Covered: spectral fidelity both ways,
alias rejection, bit-exact streaming chunking, and a full packet link
through a simulated 48 kHz sound-card channel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.ops.resample import (rational_ratio, resample, resample_init,
                                   resample_pcm, resample_stream,
                                   resampler_taps)
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import default_max_lag, extract_packets_tracked, find_sync


def test_rational_ratio():
    assert rational_ratio(9600, 48000) == (5, 1)
    assert rational_ratio(48000, 9600) == (1, 5)
    assert rational_ratio(44100, 9600) == (32, 147)
    assert rational_ratio(9600, 44100) == (147, 32)


def test_prototype_dc_gain():
    h = resampler_taps(5, 1)
    assert abs(h.sum() - 5.0) < 1e-12
    # per-phase DC gain ripple is tiny for a 16-tap/phase Kaiser design
    phases = h.reshape(-1, 5).sum(axis=0)
    assert np.allclose(phases, 1.0, atol=5e-3), phases


def _tone(fs, f, n, amp=1.0, phase=0.0):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / fs + phase)
            ).astype(np.float32)


def _tone_fit(y, fs, f):
    """LSQ amplitude of a known-frequency tone in y (ignores phase)."""
    t = np.arange(len(y)) / fs
    b = np.stack([np.sin(2 * np.pi * f * t), np.cos(2 * np.pi * f * t)], 1)
    c, *_ = np.linalg.lstsq(b, np.asarray(y, np.float64), rcond=None)
    return float(np.hypot(*c))


def test_upsample_tone_fidelity():
    """9600 -> 48000: a 1 kHz tone passes at unit gain with tiny residual."""
    x = jnp.asarray(_tone(9600, 1000.0, 4800))
    y = np.asarray(resample(x, 5, 1))
    assert y.shape == (24000,)
    core = y[2000:-2000]
    amp = _tone_fit(core, 48000, 1000.0)
    assert abs(amp - 1.0) < 0.01, amp
    # residual after removing the fitted tone: everything that isn't the
    # tone (images, design ripple)
    t = np.arange(2000, len(y) - 2000) / 48000
    b = np.stack([np.sin(2 * np.pi * 1000 * t), np.cos(2 * np.pi * 1000 * t)], 1)
    c, *_ = np.linalg.lstsq(b, core.astype(np.float64), rcond=None)
    resid = core - b @ c
    assert np.sqrt(np.mean(resid ** 2)) < 2e-3


def test_downsample_rejects_out_of_band():
    """48000 -> 9600: a 1 kHz tone passes, a 10 kHz tone (beyond the 4.8 kHz
    output Nyquist) is attenuated > 60 dB instead of aliasing to 400 Hz...
    (10 kHz aliases to 9600-10000 = -400 -> 400 Hz after folding)."""
    n = 48000
    x = jnp.asarray(_tone(48000, 1000.0, n) + _tone(48000, 10000.0, n))
    y = np.asarray(resample(x, 1, 5))[1000:-1000]
    assert abs(_tone_fit(y, 9600, 1000.0) - 1.0) < 0.01
    alias = _tone_fit(y, 9600, 400.0)
    assert alias < 1e-3, alias  # > 60 dB down


def test_fractional_ratio_44100():
    """9600 -> 44100 (147/32, the awkward sound-card ratio): tone survives
    at unit gain."""
    x = jnp.asarray(_tone(9600, 1200.0, 3200))
    y = np.asarray(resample(x, 147, 32))
    assert y.shape == (3200 * 147 // 32,)
    amp = _tone_fit(y[2000:-2000], 44100, 1200.0)
    assert abs(amp - 1.0) < 0.01, amp


def test_streaming_chunks_bit_exact():
    """Chunked resample_stream == one-shot, exactly, both directions."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6400)).astype(np.float32))
    for l, m in ((5, 1), (1, 5), (147, 32)):
        one = np.asarray(resample(x, l, m))
        st = resample_init(l, m, batch_shape=(2,))
        outs = []
        pos = 0
        for chunk in (1600, 3200, 1600):   # multiples of every M
            y, st = resample_stream(x[:, pos:pos + chunk], st, l, m)
            outs.append(np.asarray(y))
            pos += chunk
        np.testing.assert_array_equal(np.concatenate(outs, axis=1), one)


def test_streaming_short_chunks_chain():
    """Chunks shorter than the carried history (Q*M samples) must chain
    correctly: the new state is the tail of [state | chunk], not of the
    chunk alone (a chunk-only slice silently returns the whole short chunk
    and corrupts the stream).  48000 -> 9600 (l=1, m=5) has Q*M = 80; feed
    one-group (5-sample) chunks.  Tolerance, not equality: XLA tiles the
    J=1 matmul differently from the big-J one, so outputs agree to float32
    rounding (~1 ulp), unlike the same-scale chunking above."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1200,)).astype(np.float32))
    for l, m in ((1, 5), (147, 32)):
        n = x.shape[-1] - (x.shape[-1] % m)
        one = np.asarray(resample(x[:n], l, m))
        st = resample_init(l, m)
        outs = []
        pos = 0
        for chunk in ([m] * 8 + [5 * m, n]):  # tiny, then the rest
            take = min(chunk, n - pos)
            if take == 0:
                break
            y, st = resample_stream(x[pos:pos + take], st, l, m)
            outs.append(np.asarray(y))
            pos += take
        np.testing.assert_allclose(np.concatenate(outs), one,
                                   rtol=2e-7, atol=1e-6)


def test_round_trip_identity():
    """9600 -> 48000 -> 9600 preserves in-band content: each probe tone
    returns at its amplitude (±1%) and the non-tone residual is ~50 dB
    down.  (The round trip lands on a fractional group delay, so compare
    via per-tone fits rather than waveform alignment.)"""
    rng = np.random.default_rng(1)
    n = 9600
    freqs = (700.0, 1500.0, 2300.0)
    x = sum(_tone(9600, f, n, amp=0.3, phase=rng.uniform(0, 6))
            for f in freqs)
    up = resample(jnp.asarray(x), 5, 1)
    back = np.asarray(resample(up, 1, 5))[500:-500]
    for f in freqs:
        amp = _tone_fit(back, 9600, f)
        assert abs(amp - 0.3) < 0.003, (f, amp)
    t = np.arange(500, n - 500) / 9600
    b = np.concatenate(
        [np.stack([np.sin(2 * np.pi * f * t), np.cos(2 * np.pi * f * t)], 1)
         for f in freqs], axis=1)
    c, *_ = np.linalg.lstsq(b, back.astype(np.float64), rcond=None)
    resid = back - b @ c
    assert np.sqrt(np.mean(resid ** 2)) < 2e-3, np.sqrt(np.mean(resid ** 2))


def test_modem_link_through_48k_soundcard():
    """Full link at a 48 kHz device rate: TX PCM 9600 -> up x5 ("the sound
    card D/A") -> AWGN at 48 kHz -> down /5 ("the A/D") -> RX decodes every
    packet.  This is the deployment topology the reference cannot express
    (it assumes the device runs at FS)."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(2)
    payload = jnp.asarray(rng.integers(0, 2, (40, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)

    dev = resample_pcm(pcm.reshape(-1), 9600, 48000)
    sp = float(jnp.mean((dev.astype(jnp.float32) / 16384.0) ** 2))
    dev = awgn_pcm(jax.random.key(3), dev, snr_db=13.0, signal_power=sp)
    back = resample_pcm(dev, 48000, 9600)

    npad = (-back.shape[-1]) % cfg.frame_size
    back = jnp.concatenate([back, jnp.zeros((npad,), back.dtype)])
    _, out = rx_stream(cfg, rx_init(cfg), back.reshape(-1, cfg.frame_size))
    bits = out.bits.ravel()
    skip = 8 * pcfg.frame_bits
    sync = find_sync(pcfg, bits[skip:], max_lag=default_max_lag(pcfg),
                     probe_frames=4)
    nav = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
    rx = extract_packets_tracked(pcfg, bits[skip:], sync, nav)
    ok = np.asarray(rx.crc_ok)
    assert int(sync.score) == 4
    assert ok.size >= 25 and ok.all(), f"{int(ok.sum())}/{ok.size}"
    assert abs(float(jnp.mean(out.freq_hz[-10:])) - 50.0) < 3.0
