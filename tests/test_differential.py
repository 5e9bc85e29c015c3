"""Differential QPSK (ops/differential.py + cfg.differential wiring).

Covers the pure encode/decode algebra (rotation immunity, streaming carry)
and the end-to-end property that motivates the mode: packets decode with NO
rotation-hypothesis search, and a mid-stream 90-degree cycle slip costs one
symbol instead of the rest of the stream.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.modem import rx_stream, tx_bits_frame, tx_stream
from qpsk_tpu.ops.cplx import CF32, cmul
from qpsk_tpu.ops.differential import (diff_decode_symbols, diff_encode_bits,
                                       diff_rx_init, diff_tx_init)
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import extract_packets, find_sync

CFG = ModemConfig(differential=True)
PCFG = PacketConfig(payload_bytes=30)


def _rot(sym: CF32, theta: float) -> CF32:
    return cmul(sym, CF32(jnp.float32(math.cos(theta)),
                          jnp.float32(math.sin(theta))))


def test_roundtrip_any_rotation():
    """encode -> rotate by 45 + k*90 deg -> decode recovers all but the
    first symbol (whose reference phasor the rotation doesn't multiply)."""
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (512,), dtype=np.int32))
    sym, _ = diff_encode_bits(bits, diff_tx_init())
    for k in range(4):
        got, _ = diff_decode_symbols(
            _rot(sym, math.pi / 4 + k * math.pi / 2), diff_rx_init())
        assert np.array_equal(np.asarray(got[2:]), np.asarray(bits[2:])), k


def test_streaming_carry_matches_oneshot():
    """Two chained half-stream calls == one full-stream call, bit for bit,
    on both the TX and RX side."""
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (400,), dtype=np.int32))
    sym_full, ctx = diff_encode_bits(bits, diff_tx_init())
    s1, c1 = diff_encode_bits(bits[:200], diff_tx_init())
    s2, c2 = diff_encode_bits(bits[200:], c1)
    assert np.array_equal(np.asarray(sym_full.re),
                          np.concatenate([s1.re, s2.re]))
    assert int(ctx) == int(c2)

    rx = _rot(sym_full, math.pi / 4)
    d_full, _ = diff_decode_symbols(rx, diff_rx_init())
    h1 = CF32(rx.re[:100], rx.im[:100])
    h2 = CF32(rx.re[100:], rx.im[100:])
    d1, cr = diff_decode_symbols(h1, diff_rx_init())
    d2, _ = diff_decode_symbols(h2, cr)
    assert np.array_equal(np.asarray(d_full),
                          np.concatenate([np.asarray(d1), np.asarray(d2)]))


def test_cycle_slip_costs_one_symbol():
    """A 90-deg phase jump halfway through corrupts at most the one symbol
    spanning the jump — absolute QPSK would corrupt every symbol after it."""
    rng = np.random.default_rng(2)
    bits = jnp.asarray(rng.integers(0, 2, (1000,), dtype=np.int32))
    sym, _ = diff_encode_bits(bits, diff_tx_init())
    n = sym.shape[-1]
    theta = jnp.where(jnp.arange(n) < n // 2, math.pi / 4,
                      math.pi / 4 + math.pi / 2).astype(jnp.float32)
    rx = cmul(sym, CF32(jnp.cos(theta), jnp.sin(theta)))
    got, _ = diff_decode_symbols(rx, diff_rx_init())
    errs = np.flatnonzero(np.asarray(got[2:]) != np.asarray(bits[2:])) + 2
    assert errs.size <= 2  # one dibit
    assert all(abs(e - 1000 // 2) <= 2 for e in errs)


def test_loopback_differential_no_rotation_search():
    """Full modem loopback at +50 Hz: find_sync must land rotation 0 (the
    differential decode is rotation-free) and every post-transient packet
    must be bit-exact."""
    rng = np.random.default_rng(3)
    nframes, skip = 30, 8
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    chan_bits = assemble_packet(PCFG, payload)

    def tx_one(st, b):
        st, pcm = tx_bits_frame(CFG, st, b, tx_offset_hz=50.0)
        return st, pcm

    _, pcm = jax.lax.scan(tx_one, tx_init(CFG), chan_bits)
    _, out = rx_stream(CFG, rx_init(CFG), pcm.reshape(-1, CFG.frame_size))

    bits = out.bits.ravel()
    skip_bits = skip * PCFG.frame_bits
    sync = find_sync(PCFG, bits[skip_bits:], max_lag=600, probe_frames=4)
    assert int(sync.rotation) == 0
    assert int(sync.score) == 4
    navail = (bits.size - skip_bits - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, bits[skip_bits:], sync, navail)
    assert np.asarray(rx.crc_ok).all()


def test_tx_stream_matches_frame_scan():
    """Differential TX: the fused stream and the per-frame scan must emit
    the same PCM (the accumulator carry seams exactly).  Tolerance: like the
    absolute-mode twin, a float that lands within rounding of an integer may
    truncate either way between the two lowerings — allow +/-1 LSB on a
    handful of samples, which is what the non-differential paths exhibit."""
    rng = np.random.default_rng(4)
    bits = jnp.asarray(rng.integers(0, 2, (6, 256), dtype=np.int32))

    def tx_one(st, b):
        st, pcm = tx_bits_frame(CFG, st, b, tx_offset_hz=50.0)
        return st, pcm

    st_a, pcm_a = jax.lax.scan(tx_one, tx_init(CFG), bits)
    st_b, pcm_b = tx_stream(CFG, tx_init(CFG), bits, tx_offset_hz=50.0)
    a = np.asarray(pcm_a).astype(np.int32)
    b = np.asarray(pcm_b).astype(np.int32)
    assert np.abs(a - b).max() <= 1
    assert np.count_nonzero(a != b) <= a.size // 100
    assert int(st_a.diff_phase) == int(st_b.diff_phase)
