"""Block-parallel single-stream demod (parallel/blocks.py)."""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.parallel import rx_stream_blockparallel
from qpsk_tpu.sync import extract_packets_tracked, find_sync

CFG = ModemConfig()
PCFG = PacketConfig(payload_bytes=30)


def _make_stream(nframes, seed=0):
    rng = np.random.default_rng(seed)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    _, pcm = tx_stream(CFG, tx_init(CFG), assemble_packet(PCFG, payload),
                       tx_offset_hz=50.0)
    return payload, pcm


def test_blockparallel_decodes_packets():
    nframes = 64
    payload, pcm = _make_stream(nframes)
    syms, bits, fhz = rx_stream_blockparallel(CFG, pcm, nblocks=8,
                                              overlap_sym=64)
    assert bits.shape == (nframes * 256,)
    # every block's loop pulls in the +50 Hz offset
    np.testing.assert_allclose(np.asarray(fhz), 50.0, atol=10.0)

    sync = find_sync(PCFG, bits, max_lag=600, probe_frames=4)
    assert int(sync.score) >= 3
    navail = (bits.shape[0] - int(sync.bit_lag)) // PCFG.frame_bits
    rx = extract_packets_tracked(PCFG, bits, sync, navail)
    ok = np.asarray(rx.crc_ok)
    got = np.asarray(rx.payload_bits)
    want = np.asarray(payload)
    # block seams cost at most ~1 packet each (8 blocks); the rest decode
    assert ok.sum() >= navail - 10, (int(ok.sum()), navail)
    # every CRC-passing packet is bit-exact against some TX payload
    exact = sum(any(np.array_equal(got[i], want[k])
                    for k in range(nframes))
                for i in range(navail) if ok[i])
    assert exact == int(ok.sum())


def test_blockparallel_single_block_matches_serialish():
    """nblocks=1 degenerates to a plain warm-started serial decode."""
    nframes = 16
    payload, pcm = _make_stream(nframes, seed=1)
    syms, bits, fhz = rx_stream_blockparallel(CFG, pcm, nblocks=1)
    assert abs(float(fhz[0]) - 50.0) < 10.0
    sync = find_sync(PCFG, bits, max_lag=600, probe_frames=3)
    assert int(sync.score) >= 2
