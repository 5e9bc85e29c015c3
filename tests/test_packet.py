"""Packet-layer known-answer and property tests.

KAT values were produced by compiling the reference ``algorithms/`` sources
(crc16.c, bit-scramble.c, interleave.c) with a small driver and recording
the outputs — the framework must match them bit-exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qpsk_tpu.packet import (PacketConfig, assemble_packet, bits_to_bytes,
                             bits_to_dibits, bytes_to_bits, crc16, crc16_np,
                             deinterleave_bits, dibits_to_bits,
                             disassemble_packet, interleave_bits, keystream,
                             scramble_bits)
from qpsk_tpu.packet.crc16 import crc16_append_bits, crc16_check_bits
from qpsk_tpu.packet.interleave import golden_prime


# --- CRC16 (crc16.c:11-23) ---

CRC_KATS = [
    (np.frombuffer(b"123456789", np.uint8), 0x29B1),
    (np.zeros(8, np.uint8), 0x313E),
    (np.full(4, 0xFF, np.uint8), 0x1D0F),
    (np.array([(i * 17 + 3) & 0xFF for i in range(16)], np.uint8), 0xD807),
]


@pytest.mark.parametrize("data,want", CRC_KATS)
def test_crc16_kat(data, want):
    assert crc16_np(data) == want
    assert int(crc16(jnp.asarray(data))) == want


def test_crc16_batched():
    data = np.stack([k[0][:4] for k in CRC_KATS if len(k[0]) >= 4])
    got = np.asarray(crc16(jnp.asarray(data)))
    assert list(got) == [crc16_np(row) for row in data]


def test_crc16_append_check():
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, size=(3, 8 * 30), dtype=np.int32)
    frame = crc16_append_bits(jnp.asarray(payload))
    assert frame.shape == (3, 8 * 30 + 16)
    assert bool(crc16_check_bits(frame).all())
    # flip one bit -> CRC must fail
    bad = frame.at[1, 17].set(1 - frame[1, 17])
    ok = np.asarray(crc16_check_bits(bad))
    assert ok[0] and ok[2] and not ok[1]


# --- DVB scrambler (bit-scramble.c:41-69) ---

KEYSTREAM_128 = ("0000001111110110000010000011010000110000101110001010001110010011"
                 "1100100101101000101101110111001110110011001010011010101011110101")

SCRAMBLE_PAT_OUT = [0, 1, 2, 0, 3, 2, 0, 2, 0, 1, 3, 3, 0, 2, 0, 3,
                    0, 2, 2, 3, 1, 2, 3, 3, 1, 0, 2, 0, 1, 3, 2, 0]


def test_keystream_kat():
    ks = keystream(128)
    assert "".join(map(str, ks.tolist())) == KEYSTREAM_128


def test_scramble_dibit_pattern_kat():
    dibits = np.arange(32, dtype=np.int32) & 3
    bits = dibits_to_bits(jnp.asarray(dibits))
    out = bits_to_dibits(scramble_bits(bits))
    assert out.tolist() == SCRAMBLE_PAT_OUT


def test_scramble_involution():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, size=(4, 256), dtype=np.int32))
    assert np.array_equal(np.asarray(scramble_bits(scramble_bits(bits))), bits)


# --- Golden-prime interleaver (interleave.c:33-74) ---

def test_golden_prime_selection():
    assert golden_prime(64) == 61
    assert golden_prime(176) == 173
    assert golden_prime(8) == 7
    assert golden_prime(10000) == 347  # table saturates (interleave.c:55)


def test_interleave_kat_8bytes():
    data = np.array([0xAA, 0xAA, 0xAA, 0xAA, 0, 0, 0, 0], np.uint8)
    bits = bytes_to_bits(jnp.asarray(data))
    inter = bits_to_bytes(interleave_bits(bits))
    assert bytes(np.asarray(inter)) == bytes.fromhex("82200882288aa228")
    deinter = bits_to_bytes(deinterleave_bits(bytes_to_bits(inter)))
    assert np.array_equal(np.asarray(deinter), data)


def test_interleave_kat_22bytes():
    data = np.arange(22, dtype=np.uint8)
    inter = bits_to_bytes(interleave_bits(bytes_to_bits(jnp.asarray(data))))
    assert bytes(np.asarray(inter)) == bytes.fromhex(
        "a43504a51405841520853021a03100a1100180812401")


def test_interleave_roundtrip_random():
    rng = np.random.default_rng(2)
    for nbytes in (4, 22, 30, 64):
        bits = jnp.asarray(rng.integers(0, 2, (2, nbytes * 8), dtype=np.int32))
        assert np.array_equal(
            np.asarray(deinterleave_bits(interleave_bits(bits))), bits)


# --- bit helpers ---

def test_bytes_bits_roundtrip():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.integers(0, 256, (5, 17), dtype=np.uint8))
    assert np.array_equal(np.asarray(bits_to_bytes(bytes_to_bits(data))), data)


# --- integrated frame pipeline ---

def test_packet_roundtrip():
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(4)
    payload = jnp.asarray(rng.integers(0, 2, (6, 240), dtype=np.int32))
    chan_bits = assemble_packet(pcfg, payload)
    assert chan_bits.shape == (6, pcfg.frame_bits)
    rx = disassemble_packet(pcfg, chan_bits)
    assert np.array_equal(np.asarray(rx.payload_bits), payload)
    assert bool(rx.crc_ok.all())


def test_packet_detects_corruption():
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, (240,), dtype=np.int32))
    chan_bits = assemble_packet(pcfg, payload)
    bad = chan_bits.at[100].set(1 - chan_bits[100])
    rx = disassemble_packet(pcfg, bad)
    assert not bool(rx.crc_ok)
