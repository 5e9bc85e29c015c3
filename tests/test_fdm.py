"""FDM multi-carrier: polyphase-DFT mux/demux (qpsk_tpu/fdm.py).

Capability extension — the reference is single-carrier (qpsk.h:16-18).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.fdm import (FdmConfig, FdmReceiver, fdm_demux,
                          fdm_demux_stream, fdm_init, fdm_mux,
                          fdm_mux_stream)
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import default_max_lag, extract_packets_tracked, find_sync


def test_band_plan():
    fcfg = FdmConfig(nslots=8)
    assert fcfg.nchan == 3
    assert fcfg.wide_fs == 8 * 9600.0
    assert fcfg.slot_center_hz(0, 1500.0) == 9600.0 + 1500.0
    assert FdmConfig(nslots=16).nchan == 7


def test_crosstalk_isolation():
    """Drive one channel, measure leakage into the others: the slot
    filters must hold neighbors below -60 dB."""
    fcfg = FdmConfig(nslots=8)
    n = 4096
    t = np.arange(n) / 9600.0
    tone = 16000 * np.cos(2 * np.pi * 1500.0 * t)
    pcm = np.zeros((fcfg.nchan, n), np.int16)
    pcm[0] = np.round(tone).astype(np.int16)
    back = np.asarray(fdm_demux(fcfg, fdm_mux(fcfg, jnp.asarray(pcm)))
                      ).astype(np.float64)
    sl = slice(400, n - 400)
    p0 = np.mean(back[0, sl] ** 2)
    assert p0 > 0.1 * np.mean(tone[sl] ** 2)   # the driven channel survives
    for c in range(1, fcfg.nchan):
        leak_db = 10 * np.log10(np.mean(back[c, sl] ** 2) / p0)
        assert leak_db < -60.0, (c, leak_db)


def test_streaming_chunks_match_one_shot():
    """Chunked mux/demux with carried state == one-shot, bit-exactly
    (same matmul shapes per chunk keep XLA's lowering identical)."""
    fcfg = FdmConfig(nslots=8)
    rng = np.random.default_rng(0)
    n = 3 * 1024
    pcm = jnp.asarray(
        rng.integers(-9000, 9000, (fcfg.nchan, n)).astype(np.int16))
    wide_one = np.asarray(fdm_mux(fcfg, pcm))
    st = fdm_init(fcfg)
    outs = []
    for i in range(3):
        w, st = fdm_mux_stream(fcfg, pcm[:, i * 1024:(i + 1) * 1024], st)
        outs.append(np.asarray(w))
    np.testing.assert_array_equal(np.concatenate(outs), wide_one)

    back_one = np.asarray(fdm_demux(fcfg, jnp.asarray(wide_one)))
    st = fdm_init(fcfg)
    outs = []
    step = 1024 * fcfg.nslots
    for i in range(3):
        p, st = fdm_demux_stream(
            fcfg, jnp.asarray(wide_one[i * step:(i + 1) * step]), st)
        outs.append(np.asarray(p))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1), back_one)


def test_fdm_receiver_streaming_push():
    """The push-mode wideband receiver decodes every subchannel from
    arbitrary-size chunks: TX -> mux -> AWGN -> FdmReceiver.push loop."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    fcfg = FdmConfig(nslots=8)
    c_n = fcfg.nchan
    nframes = 30
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, (c_n, nframes, 240),
                                       dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg, batch_shape=(c_n,)),
                       assemble_packet(pcfg, payload), tx_offset_hz=50.0)
    wide = fdm_mux(fcfg, pcm.reshape(c_n, -1))
    sp = float(jnp.mean((wide.astype(jnp.float32) / cfg.pcm_scale) ** 2))
    wide = np.asarray(awgn_pcm(jax.random.key(2), wide, snr_db=18.0,
                               signal_power=sp))
    rx = FdmReceiver(fcfg, cfg, pcfg, bucket_blocks=1024)
    got = [[] for _ in range(c_n)]
    pos = 0
    for sz in rng.integers(1000, 30000, 200):
        if pos >= wide.size:
            break
        for c, pkts in enumerate(rx.push(wide[pos:pos + int(sz)])):
            got[c].extend(pkts)
        pos += int(sz)
    for c, pkts in enumerate(rx.flush()):
        got[c].extend(pkts)
    for c in range(c_n):
        ok = [p for p in got[c] if p.crc_ok]
        assert len(ok) >= nframes - 10, (c, len(got[c]), len(ok))
        tx_set = {np.asarray(payload)[c, j].tobytes()
                  for j in range(nframes)}
        assert all(np.asarray(p.payload).astype(np.int32).tobytes()
                   in tx_set for p in ok), c


def test_fdm_receiver_impaired_wideband():
    """Acceptance: the full multi-carrier deployment chain — 3 packet
    streams muxed to one wideband, then a 40 ppm device-clock offset, a
    −14 dB level error, and 22 dB AWGN applied AT THE WIDEBAND — decodes
    on every subchannel through FdmReceiver with AGC + tracking timing
    (clock slips cost individual packets, never a channel)."""
    from qpsk_tpu.channel import clock_offset_pcm

    cfg_tx = ModemConfig()
    cfg_rx = ModemConfig(timing_mode="tracking", agc=True)
    pcfg = PacketConfig(payload_bytes=30)
    fcfg = FdmConfig(nslots=8)
    c_n = fcfg.nchan
    nframes = 40
    rng = np.random.default_rng(4)
    payload = jnp.asarray(rng.integers(0, 2, (c_n, nframes, 240),
                                       dtype=np.int32))
    _, pcm = tx_stream(cfg_tx, tx_init(cfg_tx, batch_shape=(c_n,)),
                       assemble_packet(pcfg, payload), tx_offset_hz=30.0)
    wide = fdm_mux(fcfg, pcm.reshape(c_n, -1))
    wide = clock_offset_pcm(wide, 40e-6)
    sp = float(jnp.mean((wide.astype(jnp.float32) / cfg_tx.pcm_scale) ** 2))
    wide = awgn_pcm(jax.random.key(5), wide, snr_db=22.0, signal_power=sp)
    g = 10.0 ** (-14.0 / 20.0)
    wide = np.clip(np.round(np.asarray(wide, np.float32) * g),
                   -32768, 32767).astype(np.int16)
    wide = np.concatenate(
        [wide, np.zeros((-len(wide)) % fcfg.nslots, np.int16)])

    rx = FdmReceiver(fcfg, cfg_rx, pcfg, bucket_blocks=1024)
    got = [[] for _ in range(c_n)]
    pos = 0
    for sz in rng.integers(4000, 30000, 200):
        if pos >= wide.size:
            break
        for c, p in enumerate(rx.push(wide[pos:pos + int(sz)])):
            got[c].extend(p)
        pos += int(sz)
    for c, p in enumerate(rx.flush()):
        got[c].extend(p)
    for c in range(c_n):
        ok = [p for p in got[c] if p.crc_ok]
        # absolute floor first: the receiver must have emitted (nearly)
        # the whole stream, not a clean-looking fragment of it
        assert len(got[c]) >= nframes - 12, (c, len(got[c]))
        # slips under sustained 40 ppm drift cost individual packets
        assert len(ok) >= int(0.75 * len(got[c])), (c, len(ok), len(got[c]))
        tx_set = {np.asarray(payload)[c, j].tobytes()
                  for j in range(nframes)}
        assert all(np.asarray(p.payload).astype(np.int32).tobytes()
                   in tx_set for p in ok), c
        off = rx.demods[c].counters.detected_offset_hz
        assert abs(off - 30.0) < 4.0, (c, off)


def test_fdm_modem_loopback_all_channels_bit_exact():
    """Three independent packet streams share one wideband: TX (batched) ->
    fdm_mux -> AWGN -> fdm_demux -> batched RX -> per-channel sync ->
    every packet decodes bit-exact with the +50 Hz offset detected on
    every subchannel."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    fcfg = FdmConfig(nslots=8)
    c_n = fcfg.nchan
    nframes = 24
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, (c_n, nframes, 240),
                                       dtype=np.int32))
    bits = assemble_packet(pcfg, payload)
    _, pcm = tx_stream(cfg, tx_init(cfg, batch_shape=(c_n,)), bits,
                       tx_offset_hz=50.0)
    wide = fdm_mux(fcfg, pcm.reshape(c_n, -1))
    sp = float(jnp.mean((wide.astype(jnp.float32) / cfg.pcm_scale) ** 2))
    wide = awgn_pcm(jax.random.key(9), wide, snr_db=20.0, signal_power=sp)
    back = fdm_demux(fcfg, wide)
    npad = (-back.shape[-1]) % cfg.frame_size
    back = jnp.concatenate(
        [back, jnp.zeros((c_n, npad), back.dtype)], axis=-1)
    _, out = rx_stream(cfg, rx_init(cfg, batch_shape=(c_n,)),
                       back.reshape(c_n, -1, cfg.frame_size))
    for c in range(c_n):
        b = out.bits[c].ravel()
        skip = 8 * pcfg.frame_bits
        sync = find_sync(pcfg, b[skip:], max_lag=default_max_lag(pcfg),
                         probe_frames=4)
        assert int(sync.score) >= 3, (c, int(sync.score))
        navail = (b.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
        rx = extract_packets_tracked(pcfg, b[skip:], sync, navail)
        ok = np.asarray(rx.crc_ok)
        assert ok.all(), (c, ok)
        pays = np.asarray(rx.payload_bits).astype(np.int32)
        tx_set = {np.asarray(payload)[c, j].tobytes()
                  for j in range(nframes)}
        assert all(pays[j].tobytes() in tx_set for j in range(len(ok))), c
        off = float(np.mean(np.asarray(out.freq_hz)[c, -5:]))
        assert abs(off - 50.0) < 3.0, (c, off)


@pytest.mark.slow
def test_fdm_receiver_checkpoint_resume(tmp_path):
    """FdmReceiver.save/load mid-stream: the resumed wideband receiver's
    second half emits the same per-channel packets as an uninterrupted
    run (filterbank state + wideband buffer + every subchannel
    demodulator round-trip)."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    fcfg = FdmConfig(nslots=8)
    c_n = fcfg.nchan
    nframes = 20
    rng = np.random.default_rng(7)
    payload = jnp.asarray(rng.integers(0, 2, (c_n, nframes, 240),
                                       dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg, batch_shape=(c_n,)),
                       assemble_packet(pcfg, payload), tx_offset_hz=50.0)
    wide = fdm_mux(fcfg, pcm.reshape(c_n, -1))
    sp = float(jnp.mean((wide.astype(jnp.float32) / cfg.pcm_scale) ** 2))
    wide = np.asarray(awgn_pcm(jax.random.key(4), wide, snr_db=18.0,
                               signal_power=sp))

    ref_rx = FdmReceiver(fcfg, cfg, pcfg, bucket_blocks=1024)
    ref = [[] for _ in range(c_n)]
    for c, pkts in enumerate(ref_rx.push(wide)):
        ref[c].extend(pkts)
    for c, pkts in enumerate(ref_rx.flush()):
        ref[c].extend(pkts)

    cut = wide.size // 2 + 333
    rx1 = FdmReceiver(fcfg, cfg, pcfg, bucket_blocks=1024)
    got = [list(p) for p in rx1.push(wide[:cut])]
    path = str(tmp_path / "fdm.npz")
    rx1.save(path)
    rx2 = FdmReceiver(fcfg, cfg, pcfg, bucket_blocks=1024)
    rx2.load(path)
    for c, pkts in enumerate(rx2.push(wide[cut:])):
        got[c].extend(pkts)
    for c, pkts in enumerate(rx2.flush()):
        got[c].extend(pkts)

    for c in range(c_n):
        assert len(got[c]) == len(ref[c]), (c, len(got[c]), len(ref[c]))
        for a, b in zip(got[c], ref[c]):
            assert a.crc_ok == b.crc_ok and a.stream_index == b.stream_index
            np.testing.assert_array_equal(a.payload, b.payload)
