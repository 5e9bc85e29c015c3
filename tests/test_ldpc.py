"""IRA LDPC (packet/ldpc.py): code validity, min-sum correction, the
decode-free syndrome sync metric, packet integration, end-to-end link."""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.ops import modmap
from qpsk_tpu.packet import (LdpcCode, PacketConfig, assemble_packet,
                             disassemble_packet_soft, ldpc_decode,
                             ldpc_encode, ldpc_syndrome_weight)
from qpsk_tpu.sync import extract_packets_soft_tracked, find_sync

CODE = LdpcCode(k=256)


def test_codeword_valid_and_systematic():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.integers(0, 2, (8, 256), dtype=np.int32))
    c = ldpc_encode(CODE, u)
    assert c.shape == (8, 512)
    np.testing.assert_array_equal(np.asarray(c)[:, :256], np.asarray(u))
    np.testing.assert_array_equal(
        np.asarray(ldpc_syndrome_weight(CODE, c)), 0)


def test_minsum_corrects_9pct_raw_ber():
    """Rate-1/2 n=512 min-sum corrects an AWGN channel running ~9 % raw
    BER (Eb/N0 = 2.5 dB — just above this short code's waterfall; at
    2.0 dB a couple of codewords per batch keep residual errors)."""
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, 2, (16, 256), dtype=np.int32))
    c = np.asarray(ldpc_encode(CODE, u), np.float64)
    sigma = np.sqrt(1.0 / (2 * 0.5 * 10 ** (2.5 / 10)))
    y = (1.0 - 2.0 * c) + rng.normal(0, sigma, c.shape)
    raw_ber = ((y < 0) != (c > 0.5)).mean()
    assert raw_ber > 0.07, raw_ber
    dec = np.asarray(ldpc_decode(CODE, jnp.asarray(2 * y / sigma**2,
                                                   jnp.float32)))
    assert (dec == np.asarray(u)).all()


def test_syndrome_separates_alignment():
    """The sync metric: valid codewords score 0, random (misaligned) bits
    ~m/2 — a decode-free separation find_sync exploits."""
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.integers(0, 2, (16, 256), dtype=np.int32))
    c = ldpc_encode(CODE, u)
    np.testing.assert_array_equal(np.asarray(ldpc_syndrome_weight(CODE, c)),
                                  0)
    garbage = jnp.asarray(rng.integers(0, 2, (16, 512), dtype=np.int32))
    w = np.asarray(ldpc_syndrome_weight(CODE, garbage))
    assert (w > 0.35 * CODE.m).all(), w


def test_ldpc_packet_roundtrip_with_noise():
    pcfg = PacketConfig(payload_bytes=30, fec="ldpc")
    assert pcfg.frame_bits == 512
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, (6, 240), dtype=np.int32))
    chan = assemble_packet(pcfg, payload)
    # noisy LLRs: unit-confidence bits + Gaussian noise at ~6 % raw BER
    llr = (1.0 - 2.0 * np.asarray(chan, np.float64)
           + rng.normal(0, 0.64, chan.shape))
    rx = disassemble_packet_soft(pcfg, jnp.asarray(llr, jnp.float32))
    assert np.asarray(rx.crc_ok).all()
    np.testing.assert_array_equal(np.asarray(rx.payload_bits),
                                  np.asarray(payload))


def test_ldpc_link_end_to_end():
    """5 dB SNR + 50 Hz offset: LDPC packets decode ~all (the uncoded
    link cannot even sync here, test_fec.test_coded_link_beats_uncoded);
    frame sync rides the syndrome metric, no BP in the search."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30, fec="ldpc")
    snr, seed, skip_frames = 5.0, 4, 10
    rng = np.random.default_rng(seed)
    npkt = 20
    payload = jnp.asarray(rng.integers(0, 2, (npkt, 240), dtype=np.int32))
    chan = assemble_packet(pcfg, payload).ravel()
    nframes = -(-chan.size // 256)
    pad = jnp.asarray(rng.integers(0, 2, (nframes * 256 - chan.size,),
                                   dtype=np.int32))
    frames = jnp.concatenate([chan, pad]).reshape(nframes, 256)
    _, pcm = tx_stream(cfg, tx_init(cfg), frames, tx_offset_hz=50.0)
    sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
    noisy = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr, signal_power=sp)
    _, out = rx_stream(cfg, rx_init(cfg), noisy.reshape(-1, cfg.frame_size))
    skip = skip_frames * 256
    bits = out.bits.ravel()[skip:]
    llrs = modmap.demod_soft(
        type(out.symbols)(out.symbols.re.reshape(-1),
                          out.symbols.im.reshape(-1))).ravel()[skip:]
    sync = find_sync(pcfg, bits, max_lag=600, probe_frames=4)
    assert int(sync.score) == 4, int(sync.score)
    nav = (bits.size - int(sync.bit_lag)) // pcfg.frame_bits
    rx = extract_packets_soft_tracked(pcfg, llrs, sync, nav)
    ok = np.asarray(rx.crc_ok)
    assert ok.mean() > 0.85, f"{int(ok.sum())}/{ok.size}"
