"""Packet framing: the integrated pipeline the reference left dormant.

TX:  payload bits → CRC16 append → DVB scramble → golden-prime interleave
RX:  deinterleave → descramble → CRC16 check

This is the intended design assembled from the standalone ``algorithms/``
modules (SURVEY.md §3.5): crc16.c:11 appends integrity, bit-scramble.c:57
whitens the constellation, interleave.c:43 spreads burst errors.  The
reference never wired these into its modem loop; here they are part of one
jittable bit-domain function pair, all vectorized (XOR with a cached
keystream + two gathers + a scanned CRC), batched over leading axes.

Bit order is the canonical LSB-first-within-byte order of the reference
primitives (qpsk_tpu.packet.bits).  The scrambler is re-seeded per frame
(bit-scramble.h sync-seed semantics), so frames are independent — which is
exactly what makes the packet layer embarrassingly parallel across a
sharded frame axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from qpsk_tpu.packet.crc16 import crc16_append_bits, crc16_check_bits
from qpsk_tpu.packet.interleave import deinterleave_bits, interleave_bits
from qpsk_tpu.packet.scramble import scramble_bits


@dataclasses.dataclass(frozen=True)
class PacketConfig:
    """Static framing parameters."""
    payload_bytes: int = 30          # payload per packet
    scramble_seed: int = 0x4A80      # bit-scramble.h:13
    scramble: bool = True
    interleave: bool = True

    @property
    def frame_bits(self) -> int:
        return 8 * self.payload_bytes + 16  # payload + CRC16


class RxPacket(NamedTuple):
    payload_bits: jnp.ndarray  # (..., 8*payload_bytes)
    crc_ok: jnp.ndarray        # (...,) bool


def assemble_packet(pcfg: PacketConfig, payload_bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8*payload_bytes) payload bits → (..., frame_bits) channel bits."""
    assert payload_bits.shape[-1] == 8 * pcfg.payload_bytes, payload_bits.shape
    bits = crc16_append_bits(payload_bits)
    if pcfg.scramble:
        bits = scramble_bits(bits, pcfg.scramble_seed)
    if pcfg.interleave:
        bits = interleave_bits(bits)
    return bits


def disassemble_packet(pcfg: PacketConfig, bits: jnp.ndarray) -> RxPacket:
    """(..., frame_bits) received bits → payload + CRC verdict."""
    assert bits.shape[-1] == pcfg.frame_bits, (bits.shape, pcfg.frame_bits)
    if pcfg.interleave:
        bits = deinterleave_bits(bits)
    if pcfg.scramble:
        bits = scramble_bits(bits, pcfg.scramble_seed)
    return RxPacket(payload_bits=bits[..., :-16], crc_ok=crc16_check_bits(bits))
