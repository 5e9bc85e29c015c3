"""Device-side channel impairments: sample-clock offset and oscillator
phase noise (qpsk_tpu/channel.py).

These are the two impairments every real audio-band radio link has that
the reference's noiseless spool-file loopback (qpsk.c:289-359) cannot
express — and the stimuli that motivate ``timing_mode="tracking"`` and the
gear-shift Costas loop respectively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import (awgn_pcm, clock_offset_pcm,
                              impulse_noise_pcm, phase_noise_pcm)
from qpsk_tpu.modem import rx_stream, tx_bits_frame
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import extract_packets, find_sync

PCFG = PacketConfig(payload_bytes=30)


def _tx_pcm(cfg, nframes, seed=0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    chan_bits = assemble_packet(PCFG, payload)

    def tx_one(st, b):
        st, pcm = tx_bits_frame(cfg, st, b, tx_offset_hz=50.0)
        return st, pcm

    _, pcm = jax.lax.scan(tx_one, tx_init(cfg), chan_bits)
    return payload, np.asarray(pcm).reshape(-1)


def _decode(cfg, pcm_flat, skip=14):
    n = (pcm_flat.shape[-1] // cfg.frame_size) * cfg.frame_size
    _, out = rx_stream(cfg, rx_init(cfg),
                       jnp.asarray(pcm_flat[:n]).reshape(-1, cfg.frame_size))
    bits = out.bits.ravel()
    sync = find_sync(PCFG, bits[skip * PCFG.frame_bits:], max_lag=600,
                     probe_frames=4)
    navail = (bits.size - skip * PCFG.frame_bits
              - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, bits[skip * PCFG.frame_bits:], sync,
                         max(navail, 1))
    return out, sync, np.asarray(rx.crc_ok)


def test_clock_offset_resamples_a_tone():
    """A pure tone through the +1000 ppm model comes back at f/(1+ppm)
    with cubic-interpolation accuracy (~-60 dB residual at fs/f ~ 10)."""
    fs, f, n = 9600.0, 1000.0, 9600
    x = (10000.0 * np.sin(2 * np.pi * f * np.arange(n) / fs)).astype(np.int16)
    ppm = 1000e-6
    y = np.asarray(clock_offset_pcm(jnp.asarray(x), ppm)).astype(np.float64)
    t = np.arange(len(y)) / fs
    fw = f * (1.0 + ppm)   # warped clock reads the tone faster
    b = np.stack([np.sin(2 * np.pi * fw * t), np.cos(2 * np.pi * fw * t)], 1)
    c, *_ = np.linalg.lstsq(b, y, rcond=None)
    amp = np.hypot(*c)
    assert abs(amp - 10000.0) < 100.0, amp
    resid = y - b @ c
    assert np.sqrt(np.mean(resid ** 2)) < 60.0, np.sqrt(np.mean(resid ** 2))


def test_clock_offset_zero_is_near_identity():
    rng = np.random.default_rng(0)
    x = rng.integers(-20000, 20000, 4096).astype(np.int16)
    y = np.asarray(clock_offset_pcm(jnp.asarray(x), 0.0, frac_offset=0.0))
    # positions land exactly on samples 1..n-9: identity minus the margin
    np.testing.assert_array_equal(y, x[1:1 + len(y)])


def test_tracking_decodes_device_side_clock_offset():
    """End-to-end with the DEVICE-side warp model (complements the
    host-side resample test in test_timing_tracking.py): 60 ppm decodes in
    tracking mode.  The drift makes cycle slips possible mid-stream, so
    extraction uses the slip-tracked extractor (CLAUDE.md rule for
    timing-hostile runs)."""
    from qpsk_tpu.sync import extract_packets_tracked

    cfg = ModemConfig(timing_mode="tracking")
    _, pcm = _tx_pcm(cfg, 50)
    # frac_offset=-0.5 + the model's +1 interpolation base = net half-sample
    # start, like the host-side test: total offset+drift stays inside one
    # symbol period over the run (a wrap is an elastic-framing event the
    # streaming runtime handles by re-syncing, not the timing loop)
    warped = np.asarray(clock_offset_pcm(jnp.asarray(pcm), 60e-6,
                                         frac_offset=-0.5))
    n = (warped.shape[-1] // cfg.frame_size) * cfg.frame_size
    _, out = rx_stream(cfg, rx_init(cfg),
                       jnp.asarray(warped[:n]).reshape(-1, cfg.frame_size))
    bits = out.bits.ravel()
    skip = 14
    sync = find_sync(PCFG, bits[skip * PCFG.frame_bits:], max_lag=600,
                     probe_frames=4)
    navail = (bits.size - skip * PCFG.frame_bits
              - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets_tracked(PCFG, bits[skip * PCFG.frame_bits:], sync,
                                 max(navail, 1))
    ok = np.asarray(rx.crc_ok)
    assert int(sync.score) >= 2, int(sync.score)
    assert ok.mean() > 0.8, ok.mean()


def test_tracked_extractor_follows_a_symbol_slip():
    """Synthetic symbol slip: drop one symbol (2 bits) mid-stream.  With
    max_slip the tracker walks the bit lag and loses only the packet the
    slip lands in; without it every later packet is gone."""
    from qpsk_tpu.packet import assemble_packet
    from qpsk_tpu.sync import SyncResult, extract_packets_tracked

    rng = np.random.default_rng(3)
    nf = 20
    payload = jnp.asarray(rng.integers(0, 2, (nf, 240), dtype=np.int32))
    stream = np.asarray(assemble_packet(PCFG, payload)).reshape(-1)
    cut = 7 * PCFG.frame_bits + 100          # inside packet 7
    slipped = jnp.asarray(np.concatenate([stream[:cut], stream[cut + 2:]]))
    sync = SyncResult(rotation=jnp.int32(0), bit_lag=jnp.int32(0),
                      score=jnp.int32(4))
    navail = slipped.size // PCFG.frame_bits - 1   # headroom for +shift

    rx0 = extract_packets_tracked(PCFG, slipped, sync, navail)
    ok0 = np.asarray(rx0.crc_ok)
    assert ok0[:7].all() and not ok0[7:].any()     # untracked: stream lost

    rx1 = extract_packets_tracked(PCFG, slipped, sync, navail, max_slip=1)
    ok1 = np.asarray(rx1.crc_ok)
    assert ok1[:7].all()
    assert not ok1[7]                              # the slipped packet
    assert ok1[8:].all()                           # recovered after it
    shift = np.asarray(rx1.shift)
    assert (shift[:7] == 0).all() and (shift[8:] == -2).all()
    # recovered payloads are the transmitted ones
    got = np.asarray(rx1.payload_bits)[8:]
    exp = np.asarray(payload)[8:8 + got.shape[0]]
    np.testing.assert_array_equal(got, exp)


def test_slip_tracking_decodes_wrapping_clock_offset():
    """The case plain tracking cannot survive: a start offset that makes
    the timing phase WRAP mid-stream (one-symbol slip).  max_slip=2 lag
    tracking recovers everything but the slip packet."""
    from qpsk_tpu.sync import extract_packets_tracked

    cfg = ModemConfig(timing_mode="tracking")
    _, pcm = _tx_pcm(cfg, 50)
    # +0.5 frac + the model's +1 base: tau starts ~2.5 and wraps past the
    # symbol boundary mid-stream (see test_tracking_decodes_device_side_
    # clock_offset for the non-wrapping variant)
    warped = np.asarray(clock_offset_pcm(jnp.asarray(pcm), 60e-6,
                                         frac_offset=0.5))
    n = (warped.shape[-1] // cfg.frame_size) * cfg.frame_size
    _, out = rx_stream(cfg, rx_init(cfg),
                       jnp.asarray(warped[:n]).reshape(-1, cfg.frame_size))
    bits = out.bits.ravel()
    skip = 14
    sync = find_sync(PCFG, bits[skip * PCFG.frame_bits:], max_lag=600,
                     probe_frames=4)
    navail = (bits.size - skip * PCFG.frame_bits
              - int(sync.bit_lag)) // PCFG.frame_bits - 1
    rx0 = extract_packets_tracked(PCFG, bits[skip * PCFG.frame_bits:], sync,
                                  max(navail, 1))
    rx = extract_packets_tracked(PCFG, bits[skip * PCFG.frame_bits:], sync,
                                 max(navail, 1), max_slip=2)
    ok0 = np.asarray(rx0.crc_ok)
    ok = np.asarray(rx.crc_ok)
    # while tau rides the wrap boundary the grid genuinely chatters
    # (packets there are lost either way); the capability under test is
    # that the stream RECOVERS once tau settles on the far side — the
    # untracked extractor never does
    assert not ok0[-10:].any(), ok0
    assert ok[-10:].all(), (ok, np.asarray(rx.shift))
    assert ok.mean() > 0.5, ok.mean()


def test_stream_demodulator_rides_through_symbol_slip():
    """The deployment object under sustained clock drift: push the
    wrapping-tau stream chunk by chunk through StreamDemodulator.  With
    slip tracking (default) the receiver keeps decoding across the symbol
    slip; with slip_track=0 it burns resync_after packets and a re-hunt."""
    from qpsk_tpu.runtime import StreamDemodulator

    cfg = ModemConfig(timing_mode="tracking")
    _, pcm = _tx_pcm(cfg, 50)
    warped = np.asarray(clock_offset_pcm(jnp.asarray(pcm), 60e-6,
                                         frac_offset=0.5))

    def run(slip_track):
        demod = StreamDemodulator(cfg, PCFG, slip_track=slip_track)
        pkts = []
        for i in range(0, len(warped), 3000):
            pkts += demod.push(warped[i:i + 3000])
        pkts += demod.flush()
        return demod, pkts

    d1, p1 = run(1)
    d0, p0 = run(0)
    good1 = sum(p.crc_ok for p in p1)
    good0 = sum(p.crc_ok for p in p0)
    assert good1 > good0, (good1, good0)
    # slip tracking holds the epoch together: no resync needed, and the
    # stream after the wrap region keeps decoding
    assert d1.counters.resyncs == 0, d1.counters
    tail1 = [p.crc_ok for p in p1[-8:]]
    assert all(tail1), tail1


def test_phase_noise_zero_is_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-20000, 20000, 4096).astype(np.int16))
    y = phase_noise_pcm(jax.random.key(0), x, 0.0, 9600.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_phase_noise_is_a_wiener_walk():
    """The extracted phase of a noisy carrier must random-walk with the
    configured variance rate 2*pi*linewidth/fs."""
    fs, n, lw = 9600.0, 32768, 2.0
    tone = (12000.0 * np.cos(2 * np.pi * 1500.0 * np.arange(n) / fs))
    y = np.asarray(phase_noise_pcm(jax.random.key(42),
                                   jnp.asarray(tone.astype(np.int16)),
                                   lw, fs)).astype(np.float64)
    # analytic signal -> instantaneous phase -> remove the carrier ramp
    yf = np.fft.fft(y)
    h = np.zeros(n)
    h[0] = h[n // 2] = 1.0
    h[1:n // 2] = 2.0
    phi = np.unwrap(np.angle(np.fft.ifft(yf * h)))
    walk = (phi - 2 * np.pi * 1500.0 * np.arange(n) / fs)[100:-100]
    # per-sample diffs are band-limited by the real-carrier extraction
    # (only the phase spectrum inside [-1500, +3300] Hz survives — exactly
    # half at this carrier), so measure the random-walk growth at a long
    # lag where the walk term dominates: Var(walk[t+T]-walk[t]) ~ sigma^2*T
    T = 96
    dT = walk[T:] - walk[:-T]
    expect = 2 * np.pi * lw / fs * T
    assert 0.6 * expect < float(np.var(dT)) < 1.6 * expect, \
        (float(np.var(dT)), expect)


def test_loopback_decodes_through_phase_noise():
    """1 Hz linewidth (a mediocre crystal) is well inside the Costas
    bandwidth: the link still decodes cleanly, detected offset ~ +50 Hz."""
    cfg = ModemConfig()
    payload, pcm = _tx_pcm(cfg, 40)
    noisy = np.asarray(phase_noise_pcm(jax.random.key(7), jnp.asarray(pcm),
                                       1.0, cfg.fs))
    out, sync, ok = _decode(cfg, noisy, skip=8)
    assert int(sync.score) == 4
    assert ok.all(), f"{int(ok.sum())}/{ok.size}"
    assert abs(float(jnp.mean(out.freq_hz[-10:])) - 50.0) < 5.0


def test_impulse_noise_shapes_and_rate():
    """Bursts arrive at ~rate_hz and replace, not add: untouched samples
    pass through bit-exact."""
    x = jnp.asarray((np.arange(96000) % 1000 - 500).astype(np.int16))
    y = np.asarray(impulse_noise_pcm(jax.random.key(0), x, rate_hz=20.0,
                                     fs=9600.0))
    assert y.shape == x.shape
    changed = (y != np.asarray(x))
    # 10 s of stream at 20/s, 8-sample bursts: ~1600 changed samples
    assert 400 < changed.sum() < 6400, changed.sum()
    # zero rate: identity
    y0 = np.asarray(impulse_noise_pcm(jax.random.key(0), x, rate_hz=0.0,
                                      fs=9600.0))
    np.testing.assert_array_equal(y0, np.asarray(x))


def test_fec_rides_through_impulse_noise():
    """The FEC value proposition under the audio channel's real failure
    mode: at 10 full-scale bursts/s (14 dB AWGN underneath), the uncoded
    link loses a large fraction of packets while the interleaved
    conv-coded link decodes every one (the golden-prime interleaver
    spreads each burst across the codeword)."""
    from qpsk_tpu.modem import rx_stream, tx_stream
    from qpsk_tpu.ops.cplx import CF32
    from qpsk_tpu.ops.modmap import demod_soft
    from qpsk_tpu.packet import PacketConfig, assemble_packet
    from qpsk_tpu.state import rx_init, tx_init
    from qpsk_tpu.sync import (default_max_lag,
                               extract_packets_soft_tracked,
                               extract_packets_tracked, find_sync)

    cfg = ModemConfig()

    def run(fec):
        rng = np.random.default_rng(2)
        pcfg = PacketConfig(payload_bytes=(29 if fec else 30), fec=fec)
        pay = jnp.asarray(rng.integers(0, 2, (40, 8 * pcfg.payload_bytes),
                                       dtype=np.int32))
        _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, pay),
                           tx_offset_hz=50.0)
        sp = float(jnp.mean((pcm.astype(jnp.float32) / cfg.pcm_scale) ** 2))
        noisy = awgn_pcm(jax.random.key(1), pcm, snr_db=14.0,
                         signal_power=sp, pcm_scale=cfg.pcm_scale)
        flat = impulse_noise_pcm(jax.random.key(3), noisy.reshape(-1),
                                 rate_hz=10.0, fs=cfg.fs)
        flat = jnp.concatenate(
            [flat, jnp.zeros(((-flat.size) % cfg.frame_size,), flat.dtype)])
        _, out = rx_stream(cfg, rx_init(cfg),
                           flat.reshape(-1, cfg.frame_size))
        b = out.bits.ravel()
        skip = 8 * pcfg.frame_bits
        sync = find_sync(pcfg, b[skip:], max_lag=default_max_lag(pcfg),
                         probe_frames=4)
        nav = (b.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
        if fec:
            llrs = demod_soft(CF32(out.symbols.re.reshape(-1),
                                   out.symbols.im.reshape(-1)))
            rx = extract_packets_soft_tracked(pcfg, llrs[skip:], sync, nav)
        else:
            rx = extract_packets_tracked(pcfg, b[skip:], sync, nav)
        return float(np.asarray(rx.crc_ok).mean())

    uncoded = run(False)
    coded = run("conv")
    assert uncoded < 0.8, uncoded       # bursts visibly hurt
    assert coded >= 0.95, coded         # FEC + interleaving ride through
