"""Frame-rate AGC (ops/agc.py, ModemConfig(agc=True)).

The reference RX divides by the exact int16 scale the TX multiplied by
(qpsk.c:113, qpsk.c:260) — a calibrated-level assumption no real audio
link satisfies.  The AGC's capability: decode streams at unknown levels by
normalizing the decimated symbols to the nominal post-matched-filter RMS
before the amplitude-sensitive stages (Costas error gain, CMA modulus).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.metrics import evm
from qpsk_tpu.modem import rx_frame, rx_stream, tx_bits_frame
from qpsk_tpu.ops.agc import agc_init, agc_stream
from qpsk_tpu.ops.cplx import CF32
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
    return payload, np.asarray(pcm)


def _scale_pcm(pcm, level_db):
    g = 10.0 ** (level_db / 20.0)
    return np.clip(np.round(pcm.astype(np.float64) * g),
                   -32768, 32767).astype(np.int16)


def _decode(cfg, pcm, skip=8):
    _, out = rx_stream(cfg, rx_init(cfg), jnp.asarray(pcm))
    bits = out.bits.ravel()
    sync = find_sync(PCFG, bits[skip * PCFG.frame_bits:], max_lag=600,
                     probe_frames=4)
    navail = (bits.size - skip * PCFG.frame_bits
              - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, bits[skip * PCFG.frame_bits:], sync,
                         max(navail, 1))
    return out, sync, np.asarray(rx.crc_ok)


def test_agc_stream_normalizes_and_chains():
    """Unit: output RMS hits the target from the first frame, and chunked
    streaming with carried state equals the one-shot run exactly."""
    rng = np.random.default_rng(0)
    fr = CF32(jnp.asarray(0.01 * rng.normal(size=(3, 10, 128)),
                          dtype=jnp.float32),
              jnp.asarray(0.01 * rng.normal(size=(3, 10, 128)),
                          dtype=jnp.float32))
    est, y = agc_stream(agc_init((3,)), fr, target=1.45, mu=0.5)
    rms = np.sqrt(np.mean(np.asarray(y.re) ** 2 + np.asarray(y.im) ** 2,
                          axis=-1))
    # each frame is scaled by the mu-smoothed estimate, so the per-frame
    # output RMS fluctuates around the target by the measurement noise
    # (~1/sqrt(2*128) per frame); the mean is tight
    assert np.allclose(rms, 1.45, rtol=0.10), rms
    assert abs(float(rms.mean()) - 1.45) < 0.03, rms.mean()
    assert np.allclose(np.asarray(est), 0.01 * np.sqrt(2), rtol=0.1)

    # chunked == one-shot (state carries exactly)
    e1 = agc_init((3,))
    e1, ya = agc_stream(e1, CF32(fr.re[:, :4], fr.im[:, :4]), 1.45, 0.5)
    e1, yb = agc_stream(e1, CF32(fr.re[:, 4:], fr.im[:, 4:]), 1.45, 0.5)
    assert np.array_equal(np.asarray(ya.re), np.asarray(y.re[:, :4]))
    assert np.array_equal(np.asarray(yb.re), np.asarray(y.re[:, 4:]))
    assert np.array_equal(np.asarray(e1), np.asarray(est))


def test_agc_decodes_quiet_input():
    """-26 dB input level: the bare loop's effective bandwidth drops ~20x
    and it cannot pull in the +50 Hz offset inside the stream; with AGC
    every packet decodes and the constellation is at nominal amplitude."""
    cfg = ModemConfig(agc=True)
    _, pcm = _tx_pcm(cfg, 40)
    quiet = _scale_pcm(pcm, -26.0)

    out, sync, ok = _decode(cfg, quiet)
    assert int(sync.score) == 4
    assert ok.all()
    m = evm(CF32(out.symbols.re[10:], out.symbols.im[10:]))
    assert float(jnp.mean(m.evm_rms)) < 0.2
    amp = float(jnp.mean(jnp.sqrt(out.symbols.re[10:] ** 2
                                  + out.symbols.im[10:] ** 2)))
    assert abs(amp - 1.45) < 0.15, amp

    # the bare chain on the same stream does materially worse
    _, sync0, ok0 = _decode(ModemConfig(), quiet)
    assert int(sync0.score) < 4 or ok0.mean() < ok.mean()


def test_agc_unity_on_calibrated_input():
    """On a correctly-leveled stream the AGC is a no-op to within the RMS
    measurement: decode is unimpaired."""
    cfg = ModemConfig(agc=True)
    _, pcm = _tx_pcm(cfg, 30)
    out, sync, ok = _decode(cfg, pcm)
    assert int(sync.score) == 4
    assert ok.all()
    m = evm(CF32(out.symbols.re[10:], out.symbols.im[10:]))
    assert float(jnp.mean(m.evm_rms)) < 0.1


def test_agc_per_frame_path_matches_fused():
    """rx_frame (per-frame API) carries the same AGC state: chaining it
    frame by frame decodes the quiet stream like the fused path."""
    cfg = ModemConfig(agc=True)
    _, pcm = _tx_pcm(cfg, 24)
    quiet = jnp.asarray(_scale_pcm(pcm, -20.0))

    st = rx_init(cfg)
    outs = []
    for f in range(quiet.shape[0]):
        st, o = rx_frame(cfg, st, quiet[f])
        outs.append(o)
    amp = np.mean([float(jnp.mean(jnp.sqrt(o.symbols.re ** 2
                                           + o.symbols.im ** 2)))
                   for o in outs[10:]])
    assert abs(amp - 1.45) < 0.2, amp


def test_equalizer_in_per_frame_path():
    """rx_frame now applies the CMA equalizer (the fused path always did):
    a two-ray channel the bare per-frame chain cannot decode through."""
    from qpsk_tpu.channel import multipath_pcm

    cfg = ModemConfig(eq_taps=9)
    _, pcm = _tx_pcm(cfg, 48)
    smeared = multipath_pcm(jnp.asarray(pcm).reshape(-1),
                            [(0, 1.0), (4, 0.5)]).reshape(pcm.shape)

    st = rx_init(cfg)
    bits, syms = [], []
    for f in range(smeared.shape[0]):
        st, o = rx_frame(cfg, st, smeared[f])
        bits.append(np.asarray(o.bits))
        syms.append(o)
    m = evm(CF32(jnp.stack([o.symbols.re for o in syms[30:]]),
                 jnp.stack([o.symbols.im for o in syms[30:]])))
    assert float(jnp.mean(m.evm_rms)) < 0.35

    skip = 20
    stream = jnp.asarray(np.concatenate(bits, axis=None)
                         [skip * PCFG.frame_bits:])
    sync = find_sync(PCFG, stream, max_lag=600, probe_frames=4)
    navail = (stream.size - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, stream, sync, max(navail, 1))
    assert int(sync.score) >= 3
    assert np.asarray(rx.crc_ok).mean() > 0.9
