"""Streaming runtime (push-mode demodulator) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.runtime import StreamDemodulator

CFG = ModemConfig()
PCFG = PacketConfig(payload_bytes=30)


def _tx(nframes, seed=0, snr=None, offset=50.0):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 2, (nframes, 240), dtype=np.int32)
    _, pcm = tx_stream(CFG, tx_init(CFG), assemble_packet(PCFG, jnp.asarray(payload)),
                       tx_offset_hz=offset)
    if snr is not None:
        sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
        pcm = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr, signal_power=sp)
    return payload, np.asarray(pcm).ravel()


def _payload_set(payload):
    return {p.tobytes() for p in payload.astype(np.uint8)}


def test_stream_demodulator_odd_chunks():
    """Push in awkward chunk sizes; packets come out bit-exact."""
    payload, pcm = _tx(60)
    demod = StreamDemodulator(CFG, PCFG)
    got = []
    pos = 0
    rng = np.random.default_rng(1)
    while pos < pcm.size:
        n = int(rng.integers(100, 3000))
        got.extend(demod.push(pcm[pos:pos + n]))
        pos += n
    got.extend(demod.flush())
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 45, len(ok)
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)
    assert demod.counters.synced
    assert abs(demod.counters.detected_offset_hz - 50.0) < 5.0


def test_stream_demodulator_noisy():
    payload, pcm = _tx(80, seed=2, snr=10.0)
    demod = StreamDemodulator(CFG, PCFG)
    got = list(demod.push(pcm)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 55, len(ok)
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)


def test_stream_demodulator_resync_after_gap():
    """A silence gap kills CRC; the demodulator drops sync, re-arms, and
    decodes the second burst."""
    p1, pcm1 = _tx(40, seed=3)
    p2, pcm2 = _tx(40, seed=4)
    gap = np.zeros(4096, np.int16)
    stream = np.concatenate([pcm1, gap, pcm2])
    demod = StreamDemodulator(CFG, PCFG, resync_after=4)
    got = list(demod.push(stream)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    wanted = _payload_set(p1) | _payload_set(p2)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)
    from_first = sum(p.payload.astype(np.uint8).tobytes() in _payload_set(p1)
                     for p in ok)
    from_second = len(ok) - from_first
    assert from_first >= 25, from_first
    assert from_second >= 20, from_second
    assert demod.counters.resyncs >= 1


def test_stream_demodulator_fec_low_snr():
    """Coded streaming at 6 dB SNR — below the uncoded sync threshold:
    the runtime buffers LLRs alongside bits and decodes with soft-decision
    Viterbi; packets come out bit-exact in awkward chunk sizes."""
    pcfg = PacketConfig(payload_bytes=30, fec=True)
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 2, (40, 240), dtype=np.int32)
    _, pcm = tx_stream(CFG, tx_init(CFG),
                       assemble_packet(pcfg, jnp.asarray(payload)),
                       tx_offset_hz=50.0)
    sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
    pcm = np.asarray(awgn_pcm(jax.random.key(3), pcm, snr_db=6.0,
                              signal_power=sp)).ravel()
    demod = StreamDemodulator(CFG, pcfg)
    got = []
    pos = 0
    crng = np.random.default_rng(4)
    while pos < pcm.size:
        n = int(crng.integers(400, 5000))
        got.extend(demod.push(pcm[pos:pos + n]))
        pos += n
    got.extend(demod.flush())
    ok = [p for p in got if p.crc_ok]
    # ~25 packets survive the sync-hunt head consumption; slips cost single
    # packets (tracked rotation), so the pass rate stays high
    assert len(got) >= 24, len(got)
    assert len(ok) >= 20, len(ok)
    assert len(ok) / len(got) > 0.8
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)


def test_stream_modulator_chunks_and_circle():
    """StreamModulator: chunked pushes match one-shot tx_stream within
    1 int16 LSB (carried-phasor reassociation at call boundaries), and
    the full TX->AWGN->StreamDemodulator circle decodes bit-exact."""
    import jax

    from qpsk_tpu.channel import awgn_pcm
    from qpsk_tpu.modem import tx_stream
    from qpsk_tpu.packet import assemble_packet
    from qpsk_tpu.runtime import StreamModulator
    from qpsk_tpu.state import tx_init

    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (30, 240), dtype=np.int64)

    mod = StreamModulator(cfg, pcfg, tx_offset_hz=50.0)
    pcm = np.concatenate([mod.push(payload[:4]), mod.push(payload[4:5]),
                          mod.push(payload[5:])])
    _, one = tx_stream(cfg, tx_init(cfg),
                       assemble_packet(pcfg, jnp.asarray(payload)),
                       tx_offset_hz=50.0)
    one = np.asarray(one).ravel()
    d = np.abs(pcm.astype(np.int32) - one.astype(np.int32))
    assert d.max() <= 1 and (d != 0).mean() < 0.01

    sp = float(np.mean((pcm / cfg.pcm_scale) ** 2))
    noisy = np.asarray(awgn_pcm(jax.random.key(1), jnp.asarray(pcm),
                                snr_db=12.0, signal_power=sp))
    dem = StreamDemodulator(cfg, pcfg)
    pkts = dem.push(noisy) + dem.flush()
    ok = [p for p in pkts if p.crc_ok]
    tx_set = {payload[j].astype(np.int32).tobytes() for j in range(30)}
    assert len(ok) >= 19
    assert all(np.asarray(p.payload).astype(np.int32).tobytes() in tx_set
               for p in ok)


def test_squelch_dead_air_then_signal():
    """Squelch / carrier detect (DCD): on noise-only input the receiver
    reports no carrier, never hunts (bit buffer stays empty), and when the
    carrier appears it opens, syncs, and decodes bit-exact."""
    rng = np.random.default_rng(7)
    noise = (rng.normal(0.0, 600.0, 40 * CFG.frame_size)).astype(np.int16)
    payload, signal = _tx(50, seed=8, snr=12.0)
    demod = StreamDemodulator(CFG, PCFG, squelch_db=5.0)

    got = list(demod.push(noise))
    assert got == []
    assert not demod.counters.carrier_detect
    assert demod.counters.carrier_snr_db < 5.0
    # squelched: dead-air bits are dropped, not buffered for a hunt
    assert demod._bit_buf.size == 0

    got = list(demod.push(signal)) + list(demod.flush())
    assert demod.counters.carrier_detect
    assert demod.counters.carrier_snr_db > 5.0
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 30, len(ok)
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)


def test_squelch_matches_unsquelched_on_clean_signal():
    """With a carrier present the squelch is transparent: same packets as
    the unsquelched receiver."""
    payload, pcm = _tx(40, seed=9, snr=10.0)
    plain = StreamDemodulator(CFG, PCFG)
    gated = StreamDemodulator(CFG, PCFG, squelch_db=4.0)
    got_p = list(plain.push(pcm)) + list(plain.flush())
    got_g = list(gated.push(pcm)) + list(gated.flush())
    assert len(got_p) == len(got_g)
    for a, b in zip(got_p, got_g):
        assert a.crc_ok == b.crc_ok
        assert np.array_equal(a.payload, b.payload)
    assert gated.counters.carrier_detect
    # the blind estimate should sit near the true channel SNR
    assert abs(gated.counters.carrier_snr_db - 10.0) < 3.0


def test_carrier_snr_recorded_without_squelch():
    """The M2M4 estimate is recorded (and DCD forced open) when squelch is
    off — pure observability, no behavior change."""
    _, pcm = _tx(20, seed=10, snr=8.0)
    demod = StreamDemodulator(CFG, PCFG)
    demod.push(pcm)
    assert demod.counters.carrier_detect
    assert np.isfinite(demod.counters.carrier_snr_db)
