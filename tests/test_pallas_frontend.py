"""Fused front-end kernel (ops/pallas/frontend_kernel.py) vs the XLA chain.

Runs the Pallas kernel in interpret mode (CPU) and checks it against the
exact XLA slice it replaces in ``_rx_stream_fused`` (``frontend_xla``:
modulated-taps matched filter -> power-timing decimation -> pick phasor),
including the carried-state contract (mixed fir_tail + nco phasor) so
calls chain interchangeably across paths.  A separate test pins both
mix-free lowerings against the classic full-rate-mix staging.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsk_tpu import ModemConfig, rx_init
from qpsk_tpu.config import config_1200
from qpsk_tpu.modem import _pick_block, _tmat_for, frontend_xla
from qpsk_tpu.ops import nco, rrc as rrc_ops, timing as timing_ops
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.pallas.frontend_kernel import (frontend_supported,
                                                 rx_frontend_fused)

_xla_frontend = frontend_xla


def _mix_staged_frontend(cfg, pcm, nco_phase, fir_tail):
    """The classic full-rate-mix staging (mix -> real-tap FIR -> timing),
    kept as an independent numerical oracle for the mix-free lowerings."""
    c, nframes, fsz = pcm.shape
    n = nframes * fsz
    flat = pcm.reshape(c, n).astype(jnp.float32) / jnp.float32(cfg.pcm_scale)
    x = CF32(flat, jnp.zeros_like(flat))
    x, phase = nco.mix(x, nco_phase, -cfg.omega_center, "fast")
    block = _pick_block(fsz)
    tmat = jnp.asarray(_tmat_for(cfg, block))
    x, tail = rrc_ops.fir_block(x, fir_tail, tmat, cfg.gain, block,
                                precision=jax.lax.Precision.DEFAULT)
    frames = CF32(x.re.reshape(c, nframes, fsz),
                  x.im.reshape(c, nframes, fsz))
    picks, index = timing_ops.estimate_and_decimate(frames, cfg.cycles,
                                                    "power")
    return picks, index, phase, tail


def test_frontend_xla_matches_mix_staging():
    """The mix-free staged chain (modulated taps + pick phasor) equals the
    classic mix-then-filter staging: same timing picks, same symbols (to
    f32 reassociation), same carried state."""
    cfg = ModemConfig()
    c, nframes = 8, 4
    pcm = _pcm(cfg, c, nframes, seed=11)
    st = rx_init(cfg, batch_shape=(c,))
    m_picks, m_idx, m_ph, m_tail = _mix_staged_frontend(
        cfg, pcm, st.nco_phase, st.fir_tail)
    u_picks, u_idx, u_ph, u_tail = frontend_xla(
        cfg, pcm, st.nco_phase, st.fir_tail)
    np.testing.assert_array_equal(np.asarray(u_idx), np.asarray(m_idx))
    np.testing.assert_allclose(np.asarray(u_picks.re),
                               np.asarray(m_picks.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_picks.im),
                               np.asarray(m_picks.im), atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_ph.re), np.asarray(m_ph.re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(u_tail.re), np.asarray(m_tail.re),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_tail.im), np.asarray(m_tail.im),
                               atol=2e-4)


def _pcm(cfg, c, nframes, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(-12000, 12000,
                                    (c, nframes, cfg.frame_size),
                                    dtype=np.int16))


@pytest.mark.parametrize("cfg", [ModemConfig(), config_1200()],
                         ids=["2400", "1200"])
def test_frontend_kernel_matches_xla(cfg):
    c, nframes = 16, 4
    # 1200-baud (64 symbols/frame) rides the kernel via 2-frame grouping
    assert frontend_supported(cfg, (c,), cfg.frame_size, nframes)
    pcm = _pcm(cfg, c, nframes)
    st = rx_init(cfg, batch_shape=(c,))
    k_picks, k_idx, k_ph, k_tail = rx_frontend_fused(
        cfg, pcm, st.nco_phase, st.fir_tail, interpret=True)
    x_picks, x_idx, x_ph, x_tail = _xla_frontend(
        cfg, pcm, st.nco_phase, st.fir_tail)
    np.testing.assert_array_equal(np.asarray(k_idx), np.asarray(x_idx))
    np.testing.assert_allclose(np.asarray(k_picks.re),
                               np.asarray(x_picks.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_picks.im),
                               np.asarray(x_picks.im), atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_ph.re), np.asarray(x_ph.re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_ph.im), np.asarray(x_ph.im),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_tail.re), np.asarray(x_tail.re),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_tail.im), np.asarray(x_tail.im),
                               atol=2e-4)


def test_frontend_kernel_chains_across_calls():
    """Two chained kernel calls == one XLA pass over the concatenation —
    the carried tail/phase contract holds across call boundaries."""
    cfg = ModemConfig()
    c = 8
    pcm = _pcm(cfg, c, 6, seed=3)
    st = rx_init(cfg, batch_shape=(c,))

    p1, i1, ph1, tl1 = rx_frontend_fused(
        cfg, pcm[:, :3], st.nco_phase, st.fir_tail, interpret=True)
    p2, i2, ph2, tl2 = rx_frontend_fused(
        cfg, pcm[:, 3:], ph1, tl1, interpret=True)

    xp, xi, _, _ = _xla_frontend(cfg, pcm, st.nco_phase, st.fir_tail)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(i1), np.asarray(i2)], axis=1),
        np.asarray(xi))
    got_re = np.concatenate([np.asarray(p1.re), np.asarray(p2.re)], axis=1)
    got_im = np.concatenate([np.asarray(p1.im), np.asarray(p2.im)], axis=1)
    np.testing.assert_allclose(got_re, np.asarray(xp.re), atol=3e-4)
    np.testing.assert_allclose(got_im, np.asarray(xp.im), atol=3e-4)


def test_rx_stream_fused_frontend_end_to_end():
    """rx_stream with frontend_impl='pallas' (interpret on CPU) decodes the
    same packets as the XLA front-end across a noisy multi-frame stream."""
    import dataclasses

    from qpsk_tpu import tx_init
    from qpsk_tpu.channel import awgn_pcm
    from qpsk_tpu.modem import rx_stream, tx_stream
    from qpsk_tpu.packet import PacketConfig, assemble_packet
    from qpsk_tpu.sync import (default_max_lag, extract_packets_tracked,
                               find_sync)

    cfg_x = ModemConfig(frontend_impl="xla")
    cfg_p = dataclasses.replace(cfg_x, frontend_impl="pallas")
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(9)
    payload = jnp.asarray(rng.integers(0, 2, (24, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg_x, tx_init(cfg_x), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)
    sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
    pcm = awgn_pcm(jax.random.key(9), pcm, snr_db=12.0, signal_power=sp)
    pcm = pcm[None]  # (1, F, frame): the kernel path is batch-first

    def decode(cfg):
        _, out = rx_stream(cfg, rx_init(cfg, batch_shape=(1,)), pcm)
        bits = out.bits.reshape(-1)
        skip = 8 * pcfg.frame_bits
        sync = find_sync(pcfg, bits[skip:], max_lag=default_max_lag(pcfg),
                         probe_frames=4)
        nav = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
        rx = extract_packets_tracked(pcfg, bits[skip:], sync, nav)
        return np.asarray(rx.crc_ok), np.asarray(rx.payload_bits)

    ok_p, pay_p = decode(cfg_p)
    ok_x, pay_x = decode(cfg_x)
    assert ok_p.mean() > 0.8
    np.testing.assert_array_equal(ok_p, ok_x)
    np.testing.assert_array_equal(pay_p, pay_x)


def test_frontend_kernel_mixed_path_chaining():
    """XLA call then kernel call (and vice versa) produce the same stream:
    the state fields are path-portable."""
    cfg = ModemConfig()
    c = 8
    pcm = _pcm(cfg, c, 6, seed=5)
    st = rx_init(cfg, batch_shape=(c,))
    xp, xi, _, _ = _xla_frontend(cfg, pcm, st.nco_phase, st.fir_tail)

    # XLA first half, kernel second half
    _, _, ph, tl = _xla_frontend(cfg, pcm[:, :3], st.nco_phase, st.fir_tail)
    p2, i2, _, _ = rx_frontend_fused(cfg, pcm[:, 3:], ph, tl, interpret=True)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(xi)[:, 3:])
    np.testing.assert_allclose(np.asarray(p2.re), np.asarray(xp.re)[:, 3:],
                               atol=3e-4)

    # kernel first half, XLA second half
    _, _, ph, tl = rx_frontend_fused(cfg, pcm[:, :3], st.nco_phase,
                                     st.fir_tail, interpret=True)
    p2, i2, _, _ = _xla_frontend(cfg, pcm[:, 3:], ph, tl)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(xi)[:, 3:])
    np.testing.assert_allclose(np.asarray(p2.re), np.asarray(xp.re)[:, 3:],
                               atol=3e-4)
