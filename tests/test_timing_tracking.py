"""Frame-rate timing PLL (timing_mode="tracking", ops/timing.py).

The tracked loop's capability over the feedforward estimators: it carries a
clock-*rate* term (dtau), so a sample-clock offset between TX and RX (ppm
mismatch — the thing every real soundcard link has) is followed predictively
instead of re-measured from scratch each frame.  Simulated by resampling the
TX PCM on host at rate (1 + ppm) with a fractional start offset.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.metrics import evm
from qpsk_tpu.modem import rx_stream, tx_bits_frame
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.timing import timing_track, timing_track_init
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
    return payload, np.asarray(pcm).ravel().astype(np.float64)


def _resample(pcm, rate, offset):
    """Linear-interp resample at positions offset + i*rate (host-side clock
    -offset channel model)."""
    n = int((len(pcm) - 2 - offset) / rate)
    t = offset + np.arange(n) * rate
    i = t.astype(np.int64)
    mu = t - i
    out = pcm[i] * (1 - mu) + pcm[i + 1] * mu
    return out.astype(np.float64)


def _decode(cfg, pcm_f, payload, skip=10):
    n = (len(pcm_f) // cfg.frame_size) * cfg.frame_size
    pcm = jnp.asarray(np.round(pcm_f[:n]).astype(np.int16))
    _, out = rx_stream(cfg, rx_init(cfg), pcm.reshape(-1, cfg.frame_size))
    bits = out.bits.ravel()
    sync = find_sync(PCFG, bits[skip * PCFG.frame_bits:], max_lag=600,
                     probe_frames=4)
    navail = (bits.size - skip * PCFG.frame_bits
              - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, bits[skip * PCFG.frame_bits:], sync, navail)
    return out, sync, np.asarray(rx.crc_ok)


def test_tracking_clean_channel():
    """No clock offset: tracking mode must decode like the others."""
    cfg = ModemConfig(timing_mode="tracking")
    payload, pcm = _tx_pcm(cfg, 30)
    out, sync, ok = _decode(cfg, pcm, payload)
    assert int(sync.score) == 4
    assert ok.all()
    m = evm(CF32(out.symbols.re[10:], out.symbols.im[10:]))
    assert float(jnp.mean(m.evm_rms)) < 0.2


def test_tracking_follows_clock_rate_offset():
    """60 ppm sample-clock mismatch (a realistic soundcard crystal) plus a
    half-sample offset: the loop's rate term must follow the drift and
    packets must decode.  NOTE the drift is kept below one symbol over the
    run: when accumulated drift wraps a full symbol period the symbol grid
    necessarily slips by one symbol (an elastic-framing event, handled by
    re-running sync in the streaming runtime, not by the timing loop)."""
    ppm = 60e-6
    cfg = ModemConfig(timing_mode="tracking")
    payload, pcm = _tx_pcm(cfg, 50)
    warped = _resample(pcm, 1.0 + ppm, offset=0.5)
    out, sync, ok = _decode(cfg, warped, payload, skip=14)
    assert int(sync.score) == 4
    assert ok.mean() > 0.9
    m = evm(CF32(out.symbols.re[20:], out.symbols.im[20:]))
    assert float(jnp.mean(m.evm_rms)) < 0.2


def test_track_loop_converges_to_drift():
    """Unit test of the loop dynamics on synthetic measurements: tau ramps
    at d samples/frame; after pull-in, dtau ~= d and tau_used tracks the
    ramp within a small fraction of a sample."""
    cycles, nframes, d = 4, 60, 0.03
    true_tau = np.mod(1.7 + d * np.arange(nframes), cycles)

    # synthesize frames whose O&M estimate is exactly true_tau: put energy
    # at fractional position true_tau of each symbol group via a raised
    # cosine bump (pure tone in the timing-tone domain)
    nsym, n = 32, 32 * cycles
    k = np.arange(n)
    frames = np.stack([1.0 + np.cos(2 * np.pi * (k - t) / cycles)
                       for t in true_tau]).astype(np.float32)
    fr = CF32(jnp.asarray(np.sqrt(frames)), jnp.zeros((nframes, n), jnp.float32))

    tau_used, (tau, dtau) = timing_track(fr, cycles, timing_track_init())
    err = np.mod(np.asarray(tau_used) - true_tau + cycles / 2,
                 cycles) - cycles / 2
    assert np.all(np.abs(err[15:]) < 0.05), err
    assert abs(float(dtau) - d) < 0.01
