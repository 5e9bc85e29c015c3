"""Streaming runtime over the generic modulation family: the push-mode
StreamDemodulator buffers PRE-ROTATED bit/LLR streams (n_rot rows), so
arbitrary chunk sizes and bit-offset consumption never disturb symbol
alignment — frame_bits need not divide bits-per-symbol (8PSK)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.runtime import StreamDemodulator


def _cfg(name):
    return ModemConfig(modulation=name, agc=(name == "16qam"))


def _tx(cfg, pcfg, nframes, seed=0, snr=None, offset=30.0):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 2, (nframes, 8 * pcfg.payload_bytes),
                           dtype=np.int32)
    chan = assemble_packet(pcfg, jnp.asarray(payload)).ravel()
    mfb = cfg.bits_per_frame
    npad = (-chan.size) % mfb
    if npad:
        chan = jnp.concatenate(
            [chan, jnp.asarray(rng.integers(0, 2, (npad,), dtype=np.int32))])
    _, pcm = tx_stream(cfg, tx_init(cfg), chan.reshape(-1, mfb),
                       tx_offset_hz=offset)
    if snr is not None:
        sp = float(jnp.mean((pcm.astype(jnp.float32) / cfg.pcm_scale) ** 2))
        pcm = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr, signal_power=sp)
    return payload, np.asarray(pcm).ravel()


def _payload_set(payload):
    return {p.tobytes() for p in payload.astype(np.uint8)}


@pytest.mark.parametrize("name,snr", [("bpsk", None), ("8psk", 20.0),
                                      ("16qam", 22.0)])
def test_stream_demodulator_generic_odd_chunks(name, snr):
    """Awkward chunk sizes through the push API; packets decode bit-exact
    at operating SNR (or noiseless for the low-rate end)."""
    cfg = _cfg(name)
    pcfg = PacketConfig(payload_bytes=30)
    payload, pcm = _tx(cfg, pcfg, 60, snr=snr)
    demod = StreamDemodulator(cfg, pcfg)
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
    assert abs(demod.counters.detected_offset_hz - 30.0) < 5.0


def test_stream_demodulator_8psk_fec_soft():
    """Coded 8PSK through the runtime: the LLR buffer rows are per-rotation
    relabelings of the score matrix; soft Viterbi decodes ~3 dB below the
    uncoded operating point."""
    cfg = _cfg("8psk")
    pcfg = PacketConfig(payload_bytes=30, fec=True)
    payload, pcm = _tx(cfg, pcfg, 50, snr=17.0, seed=3)
    demod = StreamDemodulator(cfg, pcfg)
    got = list(demod.push(pcm)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 30, len(ok)
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)


def test_stream_demodulator_8psk_resync_after_gap():
    """Sync loss and re-acquisition across a silence gap, generic path."""
    cfg = _cfg("8psk")
    pcfg = PacketConfig(payload_bytes=30)
    p1, pcm1 = _tx(cfg, pcfg, 40, seed=4, snr=22.0)
    p2, pcm2 = _tx(cfg, pcfg, 40, seed=5, snr=22.0)
    stream = np.concatenate([pcm1, np.zeros(4096, np.int16), pcm2])
    demod = StreamDemodulator(cfg, pcfg, resync_after=4)
    got = list(demod.push(stream)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    wanted = _payload_set(p1) | _payload_set(p2)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)
    from_first = sum(p.payload.astype(np.uint8).tobytes() in _payload_set(p1)
                     for p in ok)
    assert from_first >= 20, from_first
    assert len(ok) - from_first >= 15, len(ok) - from_first
    assert demod.counters.resyncs >= 1


@pytest.mark.slow
def test_stream_demodulator_8psk_ldpc_soft():
    """Coded 8PSK with the LDPC family through the runtime (the
    configuration docs/per_vs_snr_8psk_ldpc.jsonl soaks): min-sum decodes
    from the per-rotation LLR rows at the coded operating point."""
    cfg = _cfg("8psk")
    pcfg = PacketConfig(payload_bytes=30, fec="ldpc")
    payload, pcm = _tx(cfg, pcfg, 40, snr=15.0, seed=5)
    demod = StreamDemodulator(cfg, pcfg)
    got = list(demod.push(pcm)) + list(demod.flush())
    ok = [p for p in got if p.crc_ok]
    assert len(ok) >= 20, (len(ok), len(got))
    wanted = _payload_set(payload)
    assert all(p.payload.astype(np.uint8).tobytes() in wanted for p in ok)
