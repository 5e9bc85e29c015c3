"""CRC-16/CCITT-FALSE (poly 0x1021, init 0xFFFF, no reflection, no xorout).

The reference computes it byte-serially with the shift-xor nibble trick
(crc16.c:11-23).  The byte-to-byte dependency is inherent to CRC, but the
per-byte transition is a pure table lookup, so the jit version is a
``lax.scan`` over bytes with a 256-entry gather per step — tiny data, and it
keeps the packet check inside the compiled RX graph.  ``crc16_np`` is the
host-side twin for packet assembly off-device.

KAT (verified against the compiled reference): crc16(b"123456789") == 0x29B1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _crc_table() -> np.ndarray:
    """Standard CRC-16/CCITT table; equivalent to the nibble-trick transition
    in crc16.c:16-20 (x = (crc>>8)^byte; x ^= x>>4; crc = crc<<8 ^ x<<12 ^
    x<<5 ^ x)."""
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        x = byte  # (crc>>8)^byte with crc's high byte folded in by the caller
        x ^= x >> 4
        table[byte] = ((x << 12) ^ (x << 5) ^ x) & 0xFFFF
    return table


def crc16_np(data: np.ndarray) -> int:
    """Host CRC over a uint8 array (crc16.c:11-23 semantics)."""
    table = _crc_table()
    crc = 0xFFFF
    for byte in np.asarray(data, np.uint8).ravel():
        crc = ((crc << 8) & 0xFFFF) ^ int(table[((crc >> 8) ^ int(byte)) & 0xFF])
    return crc


def crc16(data: jnp.ndarray) -> jnp.ndarray:
    """Jit-friendly CRC over the last axis of a (..., n) uint8 array.

    Returns (...,) uint16.  Batched over leading axes (the scan carries a
    batch of CRC registers in lockstep).
    """
    data = jnp.asarray(data, jnp.uint8)
    table = jnp.asarray(_crc_table(), jnp.uint32)
    batch_shape = data.shape[:-1]
    xs = jnp.moveaxis(data, -1, 0).astype(jnp.uint32)  # (n, ...)

    def step(crc, byte):
        idx = ((crc >> 8) ^ byte) & 0xFF
        crc = ((crc << 8) & 0xFFFF) ^ table[idx]
        return crc, None

    crc0 = jnp.full(batch_shape, 0xFFFF, jnp.uint32)
    crc, _ = jax.lax.scan(step, crc0, xs)
    return crc.astype(jnp.uint16)


def crc16_append_bits(payload_bits: jnp.ndarray) -> jnp.ndarray:
    """Append the 16 CRC bits (of the payload bytes) to a (..., 8n) bit
    stream; CRC transmitted high-byte-first, LSB-first within each byte (the
    canonical packet bit order, qpsk_tpu.packet.bits)."""
    from qpsk_tpu.packet.bits import bits_to_bytes, bytes_to_bits

    payload = bits_to_bytes(payload_bits)
    crc = crc16(payload)
    crc_bytes = jnp.stack([(crc >> 8).astype(jnp.uint8),
                           (crc & 0xFF).astype(jnp.uint8)], axis=-1)
    return jnp.concatenate([payload_bits,
                            bytes_to_bits(crc_bytes)], axis=-1)


def crc16_check_bits(frame_bits: jnp.ndarray) -> jnp.ndarray:
    """Verify a (..., 8n+16) bit stream whose last 16 bits are the CRC.
    Returns (...,) bool."""
    from qpsk_tpu.packet.bits import bits_to_bytes

    payload_bits = frame_bits[..., :-16]
    crc_bits = frame_bits[..., -16:]
    crc_bytes = bits_to_bytes(crc_bits)
    want = (crc_bytes[..., 0].astype(jnp.uint16) << 8) | crc_bytes[..., 1]
    return crc16(bits_to_bytes(payload_bits)) == want
