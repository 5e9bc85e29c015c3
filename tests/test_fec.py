"""Convolutional FEC (packet/fec.py) + soft-decision pipeline.

Encoder pinned against an independent bit-serial implementation; decoder
checked for exact round-trip, error correction, and the soft-vs-hard gain;
the packet layer's coded mode checked end-to-end through the real modem at
an SNR where uncoded packets mostly fail.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.ops import modmap
from qpsk_tpu.packet import (ConvCode, PacketConfig, assemble_packet,
                             conv_encode, disassemble_packet,
                             disassemble_packet_soft, hard_llrs,
                             viterbi_decode)
from qpsk_tpu.sync import (SyncResult, extract_packets_soft,
                           extract_packets_soft_tracked, find_sync,
                           rotate_soft)

CODE = ConvCode()


def _py_encode(bits):
    """Independent bit-serial reference encoder (same K=7 (133,171) code)."""
    reg, out = 0, []
    for u in list(bits) + [0] * (CODE.constraint - 1):
        reg = ((reg << 1) | int(u)) & 127
        for g in CODE.polys:
            out.append(bin(reg & g).count("1") & 1)
    return np.array(out, dtype=np.int32)


def test_encoder_kat():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (5, 120), dtype=np.int32)
    coded = np.asarray(conv_encode(CODE, jnp.asarray(bits)))
    ref = np.stack([_py_encode(b) for b in bits])
    assert np.array_equal(coded, ref)


def test_hard_roundtrip_and_correction():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (3, 200), dtype=np.int32))
    coded = conv_encode(CODE, bits)
    dec = viterbi_decode(CODE, hard_llrs(coded), 200)
    assert np.array_equal(np.asarray(dec), np.asarray(bits))
    # d_free = 10: well-separated flips are correctable
    c = np.asarray(coded).copy()
    for pos in (10, 100, 250, 380):
        c[:, pos] ^= 1
    dec2 = viterbi_decode(CODE, hard_llrs(jnp.asarray(c)), 200)
    assert np.array_equal(np.asarray(dec2), np.asarray(bits))


def test_soft_beats_hard():
    """At 2 dB Eb/N0 (raw BER ~0.10, the hard-decision threshold) soft
    decoding must stay an order of magnitude below hard decoding."""
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (40, 200), dtype=np.int32))
    cb = np.asarray(conv_encode(CODE, bits)).astype(np.float64)
    sigma = float(np.sqrt(1 / (2 * 0.5 * 10 ** (2.0 / 10))))
    rxs = (1 - 2 * cb) + rng.normal(0, sigma, cb.shape)
    soft = viterbi_decode(CODE, jnp.asarray(rxs, jnp.float32), 200)
    hard = viterbi_decode(
        CODE, hard_llrs(jnp.asarray((rxs < 0).astype(np.int32))), 200)
    ber_s = float(np.mean(np.asarray(soft) != np.asarray(bits)))
    ber_h = float(np.mean(np.asarray(hard) != np.asarray(bits)))
    assert ber_s < 0.02
    assert ber_s < ber_h / 5


def test_coded_packet_roundtrip_and_burst():
    """Coded frame pipeline: clean round trip, and a 12-bit channel *burst*
    recovered (interleaver spreads it across constraint lengths) where the
    uncoded frame's CRC rejects a single flipped bit."""
    pcfg = PacketConfig(payload_bytes=30, fec=True)
    assert pcfg.frame_bits == 2 * (240 + 16 + 6)
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, (8, 240), dtype=np.int32))
    chan = assemble_packet(pcfg, payload)

    rx = disassemble_packet(pcfg, chan)
    assert np.asarray(rx.crc_ok).all()
    assert np.array_equal(np.asarray(rx.payload_bits), np.asarray(payload))

    # contiguous 12-bit burst on the channel
    corrupted = np.asarray(chan).copy()
    corrupted[:, 100:112] ^= 1
    rx2 = disassemble_packet(pcfg, jnp.asarray(corrupted))
    assert np.asarray(rx2.crc_ok).all()
    assert np.array_equal(np.asarray(rx2.payload_bits), np.asarray(payload))

    # soft path agrees on hard +/-1 LLRs
    rx3 = disassemble_packet_soft(pcfg, hard_llrs(jnp.asarray(corrupted)))
    assert np.asarray(rx3.crc_ok).all()


def test_soft_tracked_recovers_cycle_slip():
    """A 90-deg rotation flip at a packet boundary (synthetic Costas cycle
    slip) on a clean coded LLR stream: the tracked soft extractor decodes
    every packet, adopting the new rotation; the fixed-rotation extractor
    loses everything after the slip."""
    pcfg = PacketConfig(payload_bytes=30, fec=True)
    rng = np.random.default_rng(5)
    npkt = 10
    payload = jnp.asarray(rng.integers(0, 2, (npkt, 240), dtype=np.int32))
    clean = hard_llrs(assemble_packet(pcfg, payload))  # (npkt, fb) LLRs
    # a physical +90-deg slip needs hypothesis r=1 to undo => apply the
    # group inverse rotation (3 steps) to the second half of the stream
    slipped = jnp.concatenate(
        [clean[:npkt // 2].ravel(),
         rotate_soft(clean[npkt // 2:].ravel(), 3)])
    sync = SyncResult(rotation=jnp.int32(0), bit_lag=jnp.int32(0),
                      score=jnp.int32(4))
    fixed = extract_packets_soft(pcfg, slipped, sync, npkt)
    tracked = extract_packets_soft_tracked(pcfg, slipped, sync, npkt)
    assert np.asarray(fixed.crc_ok).sum() == npkt // 2
    assert np.asarray(tracked.crc_ok).all()
    assert np.array_equal(np.asarray(tracked.payload_bits),
                          np.asarray(payload))
    assert np.asarray(tracked.rotation[-1]) == 1


def test_coded_link_beats_uncoded():
    """End-to-end at 5 dB SNR (+50 Hz offset): soft-decision coded packets
    ~all pass while the uncoded link cannot even sync (measured sweep:
    uncoded needs ~7 dB for its first CRC passes; coded is >0.9 from 5 dB —
    the expected ~2-3 dB net coding gain at this operating point, after the
    rate-1/2 spectral cost is already accounted for by sending twice the
    channel bits per payload)."""
    cfg = ModemConfig()
    snr, seed, skip_frames = 5.0, 4, 10
    rng = np.random.default_rng(seed)

    def run(pcfg, npkt):
        payload = jnp.asarray(
            rng.integers(0, 2, (npkt, 240), dtype=np.int32))
        chan = assemble_packet(pcfg, payload).ravel()
        nframes = -(-chan.size // 256)
        pad = jnp.asarray(rng.integers(0, 2, (nframes * 256 - chan.size,),
                                       dtype=np.int32))
        frames = jnp.concatenate([chan, pad]).reshape(nframes, 256)
        _, pcm = tx_stream(cfg, tx_init(cfg), frames, tx_offset_hz=50.0)
        sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
        noisy = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr,
                         signal_power=sp)
        _, out = rx_stream(cfg, rx_init(cfg),
                           noisy.reshape(-1, cfg.frame_size))
        skip = skip_frames * 256
        bits = out.bits.ravel()[skip:]
        llrs = modmap.demod_soft(
            type(out.symbols)(out.symbols.re.reshape(-1),
                              out.symbols.im.reshape(-1))).ravel()[skip:]
        sync = find_sync(pcfg, bits, max_lag=600, probe_frames=4)
        nav = (bits.size - int(sync.bit_lag)) // pcfg.frame_bits
        rx = extract_packets_soft_tracked(pcfg, llrs, sync, nav)
        return int(sync.score), np.asarray(rx.crc_ok)

    score_c, ok_c = run(PacketConfig(payload_bytes=30, fec=True), 24)
    score_u, ok_u = run(PacketConfig(payload_bytes=30, fec=False), 24)
    assert score_c == 4
    assert ok_c.mean() > 0.85, ok_c
    assert ok_u.mean() < 0.3, ok_u
