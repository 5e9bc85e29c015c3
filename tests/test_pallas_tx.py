"""Fused TX kernel (ops/pallas/tx_kernel.py) vs the XLA chain.

Runs the polyphase TX kernel in interpret mode (CPU) and checks it against
the exact XLA slice it replaces in ``tx_stream``: zero-stuff upsample ->
block RRC FIR -> NCO mix -> int16 PCM, including the carried-state
contract (zero-stuffed fir_tail + nco phasor) so calls chain
interchangeably across paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.config import TAU, config_1200
from qpsk_tpu.modem import _pick_block, _tmat_for, tx_stream
from qpsk_tpu.ops import modmap, nco, rrc as rrc_ops
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.pallas.tx_kernel import tx_modulate_fused, tx_supported


def _xla_tx(cfg, symbols, nco_phase, fir_tail, tx_offset_hz=0.0):
    """The reference slice of tx_stream (XLA lowering)."""
    sig = modmap.upsample_zero_stuff(symbols, cfg.cycles)
    nsym = symbols.shape[-1]
    block = _pick_block(nsym * cfg.cycles)
    tmat = jnp.asarray(_tmat_for(cfg, block))
    sig, tail = rrc_ops.fir_block(sig, fir_tail, tmat, cfg.gain, block,
                                  precision=jax.lax.Precision.DEFAULT)
    omega = TAU * (cfg.center + tx_offset_hz) / cfg.fs
    sig, phase = nco.mix(sig, nco_phase, omega, "fast")
    pcm = (sig.re * jnp.float32(cfg.pcm_scale)).astype(jnp.int16)
    return pcm, phase, tail


def _syms(cfg, c, nsym, seed=0):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(0, 2, (c, 2 * nsym), dtype=np.int32))
    return modmap.bits_to_symbols(bits)


def _assert_pcm_close(k_pcm, x_pcm, lsb=2):
    """int16 PCM from two accumulation orders of the same bf16-pass matmul
    may differ by a couple of LSB at +-16384 full scale."""
    d = np.abs(np.asarray(k_pcm, np.int32) - np.asarray(x_pcm, np.int32))
    assert d.max() <= lsb, f"PCM differs by up to {d.max()} LSB"


@pytest.mark.parametrize("cfg", [ModemConfig(), config_1200()],
                         ids=["2400", "1200"])
def test_tx_kernel_matches_xla(cfg):
    c, nsym = 16, 512
    assert tx_supported(cfg, (c,), nsym)
    sym = _syms(cfg, c, nsym)
    st = tx_init(cfg, batch_shape=(c,))
    k_pcm, k_ph, k_tl = tx_modulate_fused(cfg, sym, st.nco_phase,
                                          st.fir_tail, tx_offset_hz=50.0,
                                          interpret=True)
    x_pcm, x_ph, x_tl = _xla_tx(cfg, sym, st.nco_phase, st.fir_tail,
                                tx_offset_hz=50.0)
    _assert_pcm_close(k_pcm, x_pcm)
    np.testing.assert_allclose(np.asarray(k_ph.re), np.asarray(x_ph.re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_ph.im), np.asarray(x_ph.im),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_tl.re), np.asarray(x_tl.re),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_tl.im), np.asarray(x_tl.im),
                               atol=1e-6)


def test_tx_kernel_chains_across_calls():
    """Two chained kernel calls == one XLA pass over the concatenation."""
    cfg = ModemConfig()
    c = 8
    sym = _syms(cfg, c, 512, seed=3)
    st = tx_init(cfg, batch_shape=(c,))
    s1 = CF32(sym.re[:, :256], sym.im[:, :256])
    s2 = CF32(sym.re[:, 256:], sym.im[:, 256:])

    p1, ph1, tl1 = tx_modulate_fused(cfg, s1, st.nco_phase, st.fir_tail,
                                     tx_offset_hz=50.0, interpret=True)
    p2, ph2, tl2 = tx_modulate_fused(cfg, s2, ph1, tl1,
                                     tx_offset_hz=50.0, interpret=True)
    xp, _, _ = _xla_tx(cfg, sym, st.nco_phase, st.fir_tail,
                       tx_offset_hz=50.0)
    got = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
    _assert_pcm_close(got, xp, lsb=3)


def test_tx_kernel_mixed_path_chaining():
    """XLA call then kernel call (and vice versa): state fields are
    path-portable."""
    cfg = ModemConfig()
    c = 8
    sym = _syms(cfg, c, 512, seed=5)
    st = tx_init(cfg, batch_shape=(c,))
    s1 = CF32(sym.re[:, :256], sym.im[:, :256])
    s2 = CF32(sym.re[:, 256:], sym.im[:, 256:])
    xp, _, _ = _xla_tx(cfg, sym, st.nco_phase, st.fir_tail,
                       tx_offset_hz=50.0)

    half = 256 * cfg.cycles
    _, ph, tl = _xla_tx(cfg, s1, st.nco_phase, st.fir_tail,
                        tx_offset_hz=50.0)
    p2, _, _ = tx_modulate_fused(cfg, s2, ph, tl, tx_offset_hz=50.0,
                                 interpret=True)
    _assert_pcm_close(np.asarray(p2), np.asarray(xp)[:, half:], lsb=3)

    p1, ph, tl = tx_modulate_fused(cfg, s1, st.nco_phase, st.fir_tail,
                                   tx_offset_hz=50.0, interpret=True)
    p2x, _, _ = _xla_tx(cfg, s2, ph, tl, tx_offset_hz=50.0)
    _assert_pcm_close(np.asarray(p1), np.asarray(xp)[:, :half], lsb=3)
    _assert_pcm_close(np.asarray(p2x), np.asarray(xp)[:, half:], lsb=3)


def test_tx_stream_fused_end_to_end_decodes():
    """tx_stream with tx_impl='pallas' (interpret) produces PCM the RX
    chain decodes to the same packets as XLA TX."""
    from qpsk_tpu import rx_init
    from qpsk_tpu.modem import rx_stream
    from qpsk_tpu.packet import PacketConfig, assemble_packet
    from qpsk_tpu.sync import (default_max_lag, extract_packets_tracked,
                               find_sync)

    cfg_x = ModemConfig(tx_impl="xla")
    cfg_p = dataclasses.replace(cfg_x, tx_impl="pallas")
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(11)
    payload = jnp.asarray(rng.integers(0, 2, (16, 240), dtype=np.int32))
    frames = assemble_packet(pcfg, payload)

    def roundtrip(cfg):
        _, pcm = tx_stream(cfg, tx_init(cfg, batch_shape=(1,)),
                           frames[None], tx_offset_hz=50.0)
        _, out = rx_stream(cfg, rx_init(cfg, batch_shape=(1,)), pcm)
        bits = out.bits.reshape(-1)
        skip = 8 * pcfg.frame_bits
        sync = find_sync(pcfg, bits[skip:], max_lag=default_max_lag(pcfg),
                         probe_frames=4)
        nav = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
        rx = extract_packets_tracked(pcfg, bits[skip:], sync, nav)
        return np.asarray(rx.crc_ok), np.asarray(rx.payload_bits)

    ok_p, pay_p = roundtrip(cfg_p)
    ok_x, pay_x = roundtrip(cfg_x)
    assert ok_p.mean() > 0.8
    np.testing.assert_array_equal(ok_p, ok_x)
    np.testing.assert_array_equal(pay_p, pay_x)


def test_tx_supported_gates():
    cfg = ModemConfig()
    assert not tx_supported(cfg, (7,), 512)        # batch not /8
    assert not tx_supported(cfg, (8, 2), 512)      # batch rank
    assert not tx_supported(cfg, (8,), 100)        # nsym not /128
    assert tx_supported(cfg, (8,), 128)
