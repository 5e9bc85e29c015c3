"""Blind CMA channel equalizer (ops/equalizer.py) + multipath channel.

Capability extension past the reference (its loopback is a flat noiseless
spool file, qpsk.c:289-359): a two-ray channel smears symbols into their
neighbors and the bare chain cannot even sync; the frame-rate CMA
equalizer restores the link.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm, multipath_pcm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.equalizer import eq_init, equalize_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import default_max_lag, extract_packets_tracked, find_sync

TWO_RAY = ((0, 1.0), (4, 0.5))   # echo at 1 symbol (cycles=4), half power


def test_multipath_pcm_identity_and_delay():
    x = jnp.asarray(np.arange(1, 9, dtype=np.int16) * 100)
    y = multipath_pcm(x, [(0, 1.0)])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y2 = multipath_pcm(x, [(0, 1.0), (2, 0.5)])
    exp = np.asarray(x, np.float32)
    exp[2:] += 0.5 * np.asarray(x, np.float32)[:-2]
    np.testing.assert_array_equal(np.asarray(y2), exp.astype(np.int16))


def test_equalizer_center_spike_is_identity():
    """Fresh taps (center spike) pass symbols through unchanged; history
    carries across frames."""
    rng = np.random.default_rng(0)
    fr = CF32(jnp.asarray(rng.normal(size=(3, 4, 16)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(3, 4, 16)).astype(np.float32)))
    st = eq_init(9, batch_shape=(3,))
    _, y = equalize_stream(st, fr, mu=0.0, modulus2=2.1)
    c = 9 // 2
    got = np.asarray(y.re).reshape(3, -1)
    exp = np.asarray(fr.re).reshape(3, -1)
    # y_i = x_{i-center}: delayed by the center tap, zeros run in
    np.testing.assert_allclose(got[:, c:], exp[:, :-c], atol=1e-6)
    np.testing.assert_allclose(got[:, :c], 0.0, atol=1e-6)


def _decode(cfg, nframes=48, snr_db=18.0, paths=None, seed=5, skip=20):
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)
    if paths:
        pcm = multipath_pcm(pcm, paths)
    sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
    pcm = awgn_pcm(jax.random.key(1), pcm, snr_db=snr_db, signal_power=sp)
    flat = pcm.reshape(-1)
    npad = (-flat.size) % cfg.frame_size
    if npad:
        flat = jnp.concatenate([flat, jnp.zeros((npad,), flat.dtype)])
    _, out = rx_stream(cfg, rx_init(cfg), flat.reshape(-1, cfg.frame_size))
    bits = out.bits.reshape(-1)
    sb = skip * pcfg.frame_bits
    sync = find_sync(pcfg, bits[sb:], max_lag=default_max_lag(pcfg),
                     probe_frames=4)
    nav = (bits.size - sb - int(sync.bit_lag)) // pcfg.frame_bits
    rx = extract_packets_tracked(pcfg, bits[sb:], sync, nav)
    return int(sync.score), np.asarray(rx.crc_ok)


def test_two_ray_channel_needs_equalizer():
    """The bare chain cannot sync through a 1-symbol half-power echo."""
    score, ok = _decode(ModemConfig(), paths=TWO_RAY)
    assert score < 4 or ok.mean() < 0.5, (score, ok.mean())


def test_cma_decodes_through_two_ray_channel():
    """9-tap frame-rate CMA restores the link: full sync, PER 0 after the
    convergence window, payloads CRC-verified."""
    score, ok = _decode(ModemConfig(eq_taps=9), paths=TWO_RAY)
    assert score == 4, score
    assert ok.size >= 20
    assert ok.all(), f"{int(ok.sum())}/{ok.size}"


def test_cma_harmless_on_flat_channel():
    """Equalizer enabled on a clean (flat) channel must not degrade the
    link — the center-spike init is near-identity and CMA keeps it there."""
    score, ok = _decode(ModemConfig(eq_taps=9), paths=None)
    assert score == 4, score
    assert ok.all(), f"{int(ok.sum())}/{ok.size}"
