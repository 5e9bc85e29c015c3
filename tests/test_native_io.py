"""Native C++ IO runtime tests: spool/WAV round-trips, ring buffer, and
bit-for-bit agreement of the native packet ops with the jnp twins."""

import numpy as np
import jax.numpy as jnp
import pytest

from qpsk_tpu.io import (Ring, SpoolReader, SpoolWriter, native_crc16,
                         native_interleave_bits, native_scramble_bits,
                         read_wav, write_wav)
from qpsk_tpu.packet import (crc16_np, deinterleave_bits, interleave_bits,
                             scramble_bits)


def test_spool_roundtrip(tmp_path):
    path = str(tmp_path / "spool.raw")
    rng = np.random.default_rng(0)
    frames = rng.integers(-32768, 32767, (7, 512), dtype=np.int16)
    with SpoolWriter(path, 512) as w:
        assert w.write(frames) == 7
    with SpoolReader(path, 512) as r:
        got = r.read(10)  # ask for more than available -> short read
    np.testing.assert_array_equal(got, frames)


def test_spool_iter_short_read(tmp_path):
    """A trailing partial frame terminates iteration (qpsk.c:348-351)."""
    path = str(tmp_path / "spool.raw")
    rng = np.random.default_rng(1)
    samples = rng.integers(-100, 100, 512 * 3 + 100, dtype=np.int16)
    samples.tofile(path)
    with SpoolReader(path, 512) as r:
        frames = list(r)
    assert len(frames) == 3


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "x.wav")
    rng = np.random.default_rng(2)
    pcm = rng.integers(-20000, 20000, 9600, dtype=np.int16)
    write_wav(path, pcm, 9600)
    got, sr = read_wav(path)
    assert sr == 9600
    np.testing.assert_array_equal(got, pcm)


def test_ring_buffer():
    r = Ring(1024)
    rng = np.random.default_rng(3)
    a = rng.integers(-100, 100, 700, dtype=np.int16)
    assert r.push(a) == 700
    assert r.available == 700
    got = r.pop(512)
    np.testing.assert_array_equal(got, a[:512])
    b = rng.integers(-100, 100, 700, dtype=np.int16)
    assert r.push(b) == 700  # wraps
    got2 = r.pop(888)
    np.testing.assert_array_equal(got2, np.concatenate([a[512:], b]))
    assert r.available == 0


def test_ring_backpressure():
    r = Ring(256)
    a = np.arange(300, dtype=np.int16)
    assert r.push(a) == 256  # full: partial push
    assert r.pop(256).size == 256


def test_ring_capacity_validation():
    with pytest.raises(ValueError):
        Ring(300)  # not a power of two


def test_native_crc16_matches():
    rng = np.random.default_rng(4)
    for n in (1, 9, 64, 500):
        data = rng.integers(0, 256, n, dtype=np.uint8)
        assert native_crc16(data) == crc16_np(data)
    assert native_crc16(np.frombuffer(b"123456789", np.uint8)) == 0x29B1


def test_native_scramble_matches():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 512, dtype=np.uint8)
    got = native_scramble_bits(bits)
    want = np.asarray(scramble_bits(jnp.asarray(bits.astype(np.int32))))
    np.testing.assert_array_equal(got, want.astype(np.uint8))
    # involution
    np.testing.assert_array_equal(native_scramble_bits(got), bits)


def test_native_interleave_matches():
    rng = np.random.default_rng(6)
    for nbits in (64, 176, 2048):
        bits = rng.integers(0, 2, nbits, dtype=np.uint8)
        got = native_interleave_bits(bits)
        want = np.asarray(interleave_bits(jnp.asarray(bits.astype(np.int32))))
        np.testing.assert_array_equal(got, want.astype(np.uint8))
        back = native_interleave_bits(got, deinterleave=True)
        np.testing.assert_array_equal(back, bits)


def test_spool_feeds_modem(tmp_path):
    """Native spool -> demod interop: the modem consumes SpoolReader frames
    exactly like the reference consumes its spool file."""
    import jax
    from qpsk_tpu import ModemConfig, rx_init, tx_init
    from qpsk_tpu.modem import rx_stream, tx_bits_frame
    from qpsk_tpu.packet import PacketConfig, assemble_packet

    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(7)
    payload = jnp.asarray(rng.integers(0, 2, (10, 240), dtype=np.int32))

    def tx_one(st, b):
        st, p = tx_bits_frame(cfg, st, b, tx_offset_hz=50.0)
        return st, p

    _, pcm = jax.lax.scan(tx_one, tx_init(cfg), assemble_packet(pcfg, payload))

    path = str(tmp_path / "link.raw")
    with SpoolWriter(path, cfg.frame_size) as w:
        w.write(np.asarray(pcm).reshape(-1, cfg.frame_size))
    with SpoolReader(path, cfg.frame_size) as r:
        frames = r.read(1000)
    assert frames.shape == (10, cfg.frame_size)
    _, out = rx_stream(cfg, rx_init(cfg), jnp.asarray(frames))
    assert abs(float(out.freq_hz[-1]) - 50.0) < 5.0
