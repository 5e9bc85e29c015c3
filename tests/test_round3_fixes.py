"""Round-3 review fixes (ADVICE.md round 2): per-bucket squelch semantics,
cold restart after dead air, host-side SNR counter."""

import jax
import jax.numpy as jnp
import numpy as np

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
    _, pcm = tx_stream(CFG, tx_init(CFG),
                       assemble_packet(PCFG, jnp.asarray(payload)),
                       tx_offset_hz=offset)
    if snr is not None:
        sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
        pcm = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr, signal_power=sp)
    return payload, np.asarray(pcm).ravel()


def _payload_set(payload):
    return {p.tobytes() for p in payload.astype(np.uint8)}


def _noise(nframes, seed, scale=600.0):
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, scale, nframes * CFG.frame_size).astype(np.int16)


def test_squelch_burst_then_trailing_noise_one_push():
    """ADVICE r2 (high): a single push carrying a burst AND trailing dead
    air must decode the burst — the squelch drop is per bucket, not gated
    on the LAST bucket's carrier verdict."""
    payload, signal = _tx(40, seed=11, snr=12.0)
    stream = np.concatenate([signal, _noise(40, seed=12)])

    gated = StreamDemodulator(CFG, PCFG, squelch_db=5.0)
    got = list(gated.push(stream)) + list(gated.flush())
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 28, len(ok)
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)

    # and it matches the unsquelched receiver's good packets
    plain = StreamDemodulator(CFG, PCFG)
    ok_p = [p for p in list(plain.push(stream)) + list(plain.flush())
            if p.crc_ok]
    assert {p.payload.astype(np.uint8).tobytes() for p in ok} == \
           {p.payload.astype(np.uint8).tobytes() for p in ok_p}


def test_squelch_cold_restart_after_long_dead_air():
    """ADVICE r2 (medium): during squelched dead air the loop state is
    reset, so after a LONG gap the receiver re-runs FFT acquisition and
    re-syncs even when the returning carrier sits at a different offset
    (an integrating Costas loop would have random-walked away)."""
    p1, s1 = _tx(30, seed=13, snr=12.0, offset=50.0)
    p2, s2 = _tx(30, seed=14, snr=12.0, offset=-120.0)
    demod = StreamDemodulator(CFG, PCFG, squelch_db=5.0, resync_after=4)

    got = list(demod.push(s1))
    got += demod.push(_noise(200, seed=15))          # ~25 dead buckets
    assert not demod.counters.carrier_detect
    assert demod._bit_buf.size == 0                  # noise never buffered
    assert demod._state is None                      # cold restart armed

    got += list(demod.push(s2)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    w1, w2 = _payload_set(p1), _payload_set(p2)
    assert all(p.payload.astype(np.uint8).tobytes() in (w1 | w2) for p in ok)
    from_second = sum(p.payload.astype(np.uint8).tobytes() in w2 for p in ok)
    assert from_second >= 15, from_second
    assert abs(demod.counters.detected_offset_hz + 120.0) < 10.0


def test_snr_estimate_host_matches_device():
    """ADVICE r2 (low): the host numpy M2M4 twin agrees with the jitted
    device estimator (which stays available for in-graph use)."""
    from qpsk_tpu.metrics import snr_estimate_db, snr_estimate_db_host
    from qpsk_tpu.ops.cplx import CF32

    rng = np.random.default_rng(0)
    for snr_db in (3.0, 10.0, 20.0):
        n = 4096
        phase = rng.integers(0, 4, n) * (np.pi / 2) + np.pi / 4
        sigma = np.sqrt(0.5 / 10 ** (snr_db / 10.0))
        re = (np.cos(phase) + rng.normal(0, sigma, n)).astype(np.float32)
        im = (np.sin(phase) + rng.normal(0, sigma, n)).astype(np.float32)
        dev = float(snr_estimate_db(CF32(jnp.asarray(re), jnp.asarray(im))))
        host = snr_estimate_db_host(re, im)
        assert abs(dev - host) < 0.05, (snr_db, dev, host)
        assert abs(host - snr_db) < 1.5, (snr_db, host)


def test_push_with_trailing_noise_no_eager_snr_regression():
    """The per-bucket SNR counter is still recorded with squelch off."""
    _, pcm = _tx(10, seed=16, snr=9.0)
    demod = StreamDemodulator(CFG, PCFG)
    demod.push(pcm)
    assert np.isfinite(demod.counters.carrier_snr_db)
    assert abs(demod.counters.carrier_snr_db - 9.0) < 3.0


def test_streaming_buffers_stay_bounded_on_endless_noise():
    """24/7 receiver discipline: hours of un-synced noise must not grow
    the bit/LLR/PCM buffers (the hunt trims its dead prefix; squelch
    drops per bucket) — with and without squelch."""
    rng = np.random.default_rng(20)
    for squelch in (None, 5.0):
        demod = StreamDemodulator(CFG, PCFG, squelch_db=squelch)
        peak_bits = peak_pcm = 0
        # bucket-aligned pushes keep the hunt's stream sizes in a small
        # recurring set (arbitrary sizes would make this a jit-compile
        # soak, not a buffer soak)
        for i in range(16):
            chunk = rng.normal(0, 600.0, 4096).astype(np.int16)
            got = demod.push(chunk)
            assert got == []
            peak_bits = max(peak_bits, demod._bit_buf.shape[1])
            peak_pcm = max(peak_pcm, demod._pcm_buf.size)
        # bounded by the hunt window + probe (un-squelched) or one
        # bucket's bits (squelched); PCM by one bucket
        limit = demod.sync_skip + 4 * PCFG.frame_bits + 64 \
            + max(2 * PCFG.frame_bits, 600) + 2048
        assert peak_bits <= limit, (squelch, peak_bits, limit)
        assert peak_pcm <= 8 * CFG.frame_size, peak_pcm
        assert demod._llr_buf.size == 0  # no FEC: LLR buffer never grows

    # and a synced-then-endless-noise epoch also stays bounded (the
    # resync_after path drops sync; the hunt then trims)
    payload, signal = _tx(12, seed=21, snr=12.0)
    demod = StreamDemodulator(CFG, PCFG, resync_after=4)
    demod.push(signal)
    peak = 0
    for i in range(12):
        demod.push(rng.normal(0, 600.0, 4096).astype(np.int16))
        peak = max(peak, demod._bit_buf.shape[1])
    assert peak <= 8 * PCFG.frame_bits + 4 * PCFG.frame_bits + 64 \
        + max(2 * PCFG.frame_bits, 600) + 4096, peak
