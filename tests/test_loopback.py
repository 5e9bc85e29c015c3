"""End-to-end loopback integration tests (BASELINE configs #1 and #3).

packets → TX @ +50 Hz offset → [AWGN] → RX stream → sync → packets,
asserting carrier lock, EVM, and bit-exact payload recovery.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.metrics import evm
from qpsk_tpu.modem import rx_stream, tx_bits_frame
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import extract_packets, find_sync

CFG = ModemConfig()
PCFG = PacketConfig(payload_bytes=30)  # 256 channel bits = 1 RX frame
NFRAMES = 40
SKIP = 8  # Costas convergence transient, frames


def _run_link(snr_db, offset_hz, seed=0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (NFRAMES, 240), dtype=np.int32))
    chan_bits = assemble_packet(PCFG, payload)

    def tx_one(st, bits):
        st, pcm = tx_bits_frame(CFG, st, bits, tx_offset_hz=offset_hz)
        return st, pcm

    _, pcm = jax.lax.scan(tx_one, tx_init(CFG), chan_bits)
    if snr_db is not None:
        sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
        pcm = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr_db, signal_power=sp)
    state, out = rx_stream(CFG, rx_init(CFG), pcm.reshape(-1, CFG.frame_size))
    return payload, out


def _recover(payload, out):
    bits = out.bits.ravel()
    skip_bits = SKIP * PCFG.frame_bits
    sync = find_sync(PCFG, bits[skip_bits:], max_lag=600, probe_frames=4)
    navail = (bits.size - skip_bits - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets(PCFG, bits[skip_bits:], sync, navail)
    ok = np.asarray(rx.crc_ok)
    got = np.asarray(rx.payload_bits)
    want = np.asarray(payload)
    # anchor the stream offset with the first CRC-passing packet
    i0 = int(np.argmax(ok))
    k0 = next((k for k in range(want.shape[0])
               if np.array_equal(got[i0], want[k])), None)
    assert k0 is not None, "no payload matched — stream misaligned"
    k0 -= i0
    exact = sum(bool(ok[i]) and np.array_equal(got[i], want[i + k0])
                for i in range(navail) if 0 <= i + k0 < want.shape[0])
    return sync, ok, exact


def test_loopback_clean():
    """Noiseless + 50 Hz offset: every post-transient packet bit-exact."""
    payload, out = _run_link(None, 50.0)
    assert abs(float(out.freq_hz[-1]) - 50.0) < 3.0
    sync, ok, exact = _recover(payload, out)
    assert int(sync.score) == 4
    assert ok.all()
    assert exact >= NFRAMES - SKIP - 3


def test_loopback_awgn_10db():
    """10 dB SNR + 50 Hz offset (the BASELINE bit-exactness anchor)."""
    payload, out = _run_link(10.0, 50.0)
    # instantaneous loop freq wobbles with noise — check the mean of the tail
    assert abs(float(jnp.mean(out.freq_hz[-10:])) - 50.0) < 5.0
    sync, ok, exact = _recover(payload, out)
    assert int(sync.score) == 4
    assert ok.mean() > 0.95
    assert exact >= ok.sum() - 1

    m = evm(CF32(out.symbols.re[SKIP:], out.symbols.im[SKIP:]))
    assert float(jnp.mean(m.evm_rms)) < 0.35


def test_loopback_negative_offset():
    payload, out = _run_link(None, -80.0)
    assert abs(float(out.freq_hz[-1]) + 80.0) < 5.0
    _, ok, exact = _recover(payload, out)
    assert ok.all()


@pytest.mark.parametrize("mode", ["histogram", "power"])
def test_timing_modes_lock(mode):
    cfg = ModemConfig(timing_mode=mode)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, (20, 240), dtype=np.int32))
    chan_bits = assemble_packet(PCFG, payload)

    def tx_one(st, bits):
        st, pcm = tx_bits_frame(cfg, st, bits, tx_offset_hz=50.0)
        return st, pcm

    _, pcm = jax.lax.scan(tx_one, tx_init(cfg), chan_bits)
    _, out = rx_stream(cfg, rx_init(cfg), pcm.reshape(-1, cfg.frame_size))
    # both estimators must land a usable lock on the clean channel
    m = evm(CF32(out.symbols.re[10:], out.symbols.im[10:]))
    assert float(jnp.mean(m.evm_rms)) < 0.25
