"""Sharded execution tests on the 8-device virtual CPU mesh (conftest).

The anchor assertions: (a) the time-sharded front-end (halo-exchange
overlap-save FIR + closed-form block NCO) equals the serial chain; (b) the
channel-sharded demod equals the unsharded demod exactly; (c) time-parallel
burst decode recovers bit-exact packets per block.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.modem import rx_stream, tx_bits_frame, _pick_block, _tmat_for
from qpsk_tpu.ops import nco, rrc as rrc_ops
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.parallel import (make_channel_demod, rx_stream_timeparallel,
                               shard_channel_state)
from qpsk_tpu.parallel.stream import rx_frontend_timeparallel
from qpsk_tpu.sync import extract_packets, find_sync

CFG = ModemConfig()
PCFG = PacketConfig(payload_bytes=30)


def _mesh(axis):
    return Mesh(np.asarray(jax.devices()), (axis,))


def _tx_packets(nframes, seed=0, offset=50.0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    chan_bits = assemble_packet(PCFG, payload)

    def tx_one(st, bits):
        st, pcm = tx_bits_frame(CFG, st, bits, tx_offset_hz=offset)
        return st, pcm

    _, pcm = jax.lax.scan(tx_one, tx_init(CFG), chan_bits)
    return payload, pcm.reshape(-1)


def _serial_frontend(pcm):
    """Whole-stream mix-down + matched filter, single device."""
    xr = pcm.astype(jnp.float32) / jnp.float32(CFG.pcm_scale)
    x = CF32(xr, jnp.zeros_like(xr))
    x, _ = nco.mix(x, nco.nco_init(), -CFG.omega_center, "fast")
    n = pcm.shape[-1]
    block = _pick_block(n if n <= 512 else 512)
    tmat = jnp.asarray(_tmat_for(CFG, block))
    tail = rrc_ops.fir_init_tail(CFG.ntaps)
    y, _ = rrc_ops.fir_block(x, tail, tmat, CFG.gain, block)
    return y


def test_frontend_sharded_equals_serial():
    _, pcm = _tx_packets(16, seed=1)
    mesh = _mesh("sp")
    y_sh = rx_frontend_timeparallel(CFG, pcm, mesh)
    y = _serial_frontend(pcm)
    np.testing.assert_allclose(np.asarray(y_sh.re), np.asarray(y.re),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_sh.im), np.asarray(y.im),
                               atol=2e-4)


def test_channel_sharded_equals_unsharded():
    rng = np.random.default_rng(2)
    channels, frames = 8, 3
    pcm = jnp.asarray(rng.integers(-8192, 8192,
                                   (channels, frames, CFG.frame_size),
                                   dtype=np.int16))
    state = rx_init(CFG, batch_shape=(channels,))
    st_ref, out_ref = jax.jit(lambda s, x: rx_stream(CFG, s, x))(state, pcm)

    mesh = _mesh("dp")
    demod = make_channel_demod(CFG, mesh)
    st_sh, out_sh = demod(shard_channel_state(state, mesh), pcm)
    np.testing.assert_array_equal(np.asarray(out_sh.bits),
                                  np.asarray(out_ref.bits))
    np.testing.assert_allclose(np.asarray(out_sh.symbols.re),
                               np.asarray(out_ref.symbols.re), atol=1e-6)


def test_timeparallel_burst_decode():
    """8 time blocks of 4 frames each; every block re-acquires and its
    packets (minus the block-start transient) decode bit-exact."""
    nframes = 32
    payload, pcm = _tx_packets(nframes, seed=3)
    mesh = _mesh("sp")
    syms, bits, fhz = rx_stream_timeparallel(CFG, pcm, mesh)
    assert bits.shape == (nframes * 256,)
    # every block's loop should have pulled in near +50 Hz
    np.testing.assert_allclose(np.asarray(fhz), 50.0, atol=10.0)

    frames_per_block = nframes // 8
    block_bits = np.asarray(bits).reshape(8, frames_per_block * 256)
    want = np.asarray(payload).reshape(8, frames_per_block, 240)
    recovered = 0
    total_ok = 0
    for b in range(8):
        sync = find_sync(PCFG, jnp.asarray(block_bits[b]),
                         max_lag=min(512, (frames_per_block - 2) * 256),
                         probe_frames=2)
        if int(sync.score) == 0:
            continue
        navail = (block_bits.shape[1] - int(sync.bit_lag)) // PCFG.frame_bits
        rx = extract_packets(PCFG, jnp.asarray(block_bits[b]), sync, navail)
        ok = np.asarray(rx.crc_ok)
        got = np.asarray(rx.payload_bits)
        total_ok += int(ok.sum())
        for i in range(navail):
            if ok[i] and any(np.array_equal(got[i], want[b, j])
                             for j in range(frames_per_block)):
                recovered += 1
    # ≥1 packet per block on average survives the block transient, and
    # every CRC-passing packet is bit-exact
    assert total_ok >= 8, total_ok
    assert recovered == total_ok, (recovered, total_ok)


def test_channel_sharded_generic_8psk_equals_unsharded():
    """dp-sharded 8PSK demod (DD loop + score slicing) == unsharded,
    bit-for-bit — the generic family through the same channel sharding as
    the QPSK flagship (round-4 multi-chip gate twin)."""
    cfg = ModemConfig(modulation="8psk")
    rng = np.random.default_rng(3)
    channels, frames = 8, 3
    pcm = jnp.asarray(rng.integers(-8192, 8192,
                                   (channels, frames, cfg.frame_size),
                                   dtype=np.int16))
    state = rx_init(cfg, batch_shape=(channels,))
    _, out_ref = jax.jit(lambda s, x: rx_stream(cfg, s, x))(state, pcm)

    mesh = _mesh("dp")
    demod = make_channel_demod(cfg, mesh)
    _, out_sh = demod(shard_channel_state(state, mesh), pcm)
    np.testing.assert_array_equal(np.asarray(out_sh.bits),
                                  np.asarray(out_ref.bits))
    np.testing.assert_allclose(np.asarray(out_sh.symbols.re),
                               np.asarray(out_ref.symbols.re), atol=1e-6)


def test_channel_sharded_soft_llrs_equal_unsharded():
    """dp-sharded soft path: the LLR stream computed from sharded RX
    symbols equals the unsharded one (the FEC soft-decision input —
    a sharding bug in the LLR batching fails here, not silently)."""
    from qpsk_tpu.ops.modmap import demod_soft
    from jax.sharding import NamedSharding

    rng = np.random.default_rng(4)
    channels, frames = 8, 3
    pcm = jnp.asarray(rng.integers(-8192, 8192,
                                   (channels, frames, CFG.frame_size),
                                   dtype=np.int16))
    state = rx_init(CFG, batch_shape=(channels,))

    def step(st, x):
        st, out = rx_stream(CFG, st, x)
        sym = CF32(out.symbols.re.reshape(channels, -1),
                   out.symbols.im.reshape(channels, -1))
        return demod_soft(sym)

    llr_ref = jax.jit(step)(state, pcm)
    mesh = _mesh("dp")
    sh = NamedSharding(mesh, P("dp"))
    llr_sh = jax.jit(step, out_shardings=None)(
        jax.device_put(state, sh), jax.device_put(pcm, sh))
    np.testing.assert_allclose(np.asarray(llr_sh), np.asarray(llr_ref),
                               atol=1e-5)
