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
    # fec: wrap the CRC'd payload in a rate-1/2 code before scrambling/
    # interleaving.  Capability extension (the reference ships no FEC);
    # the interleaver now also does its real job — spreading channel burst
    # errors across the decoder's correction span.  Accepted values:
    #   False          — uncoded (reference parity)
    #   True / "conv"  — K=7 (133,171) convolutional + soft Viterbi
    #                    (packet/fec.py)
    #   "ldpc"         — IRA LDPC + batched min-sum (packet/ldpc.py);
    #                    frame sync scores by syndrome weight, decode-free
    fec: bool | str = False

    def __post_init__(self):
        if self.fec not in (False, True, "conv", "ldpc"):
            raise ValueError(f"unknown fec {self.fec!r}")

    @property
    def fec_kind(self):
        """None | 'conv' | 'ldpc' (True normalizes to 'conv')."""
        if not self.fec:
            return None
        return "conv" if self.fec is True else self.fec

    @property
    def payload_crc_bits(self) -> int:
        return 8 * self.payload_bytes + 16  # payload + CRC16

    @property
    def frame_bits(self) -> int:
        kind = self.fec_kind
        if kind == "conv":
            from qpsk_tpu.packet.fec import ConvCode
            return ConvCode().coded_bits(self.payload_crc_bits)
        if kind == "ldpc":
            return 2 * self.payload_crc_bits
        return self.payload_crc_bits

    def ldpc_code(self):
        from qpsk_tpu.packet.ldpc import LdpcCode
        return LdpcCode(k=self.payload_crc_bits)


class RxPacket(NamedTuple):
    payload_bits: jnp.ndarray  # (..., 8*payload_bytes)
    crc_ok: jnp.ndarray        # (...,) bool


def assemble_packet(pcfg: PacketConfig, payload_bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8*payload_bytes) payload bits → (..., frame_bits) channel bits.

    TX order: CRC16 append → [conv encode] → scramble → interleave — the
    scrambler whitens the *coded* stream and the interleaver spreads bursts
    across the decoder's constraint lengths."""
    assert payload_bits.shape[-1] == 8 * pcfg.payload_bytes, payload_bits.shape
    bits = crc16_append_bits(payload_bits)
    if pcfg.fec_kind == "conv":
        from qpsk_tpu.packet.fec import ConvCode, conv_encode
        bits = conv_encode(ConvCode(), bits)
    elif pcfg.fec_kind == "ldpc":
        from qpsk_tpu.packet.ldpc import ldpc_encode
        bits = ldpc_encode(pcfg.ldpc_code(), bits)
    if pcfg.scramble:
        bits = scramble_bits(bits, pcfg.scramble_seed)
    if pcfg.interleave:
        bits = interleave_bits(bits)
    return bits


def unwrap_bits(pcfg: PacketConfig, bits: jnp.ndarray) -> jnp.ndarray:
    """Undo the channel wrapping only (deinterleave + descramble),
    exposing the raw codeword/CRC bits — the input the decode-free LDPC
    syndrome sync metric scores (sync.find_sync)."""
    assert bits.shape[-1] == pcfg.frame_bits, (bits.shape, pcfg.frame_bits)
    if pcfg.interleave:
        bits = deinterleave_bits(bits)
    if pcfg.scramble:
        bits = scramble_bits(bits, pcfg.scramble_seed)
    return bits


def disassemble_packet(pcfg: PacketConfig, bits: jnp.ndarray) -> RxPacket:
    """(..., frame_bits) received *hard* bits → payload + CRC verdict.
    With FEC on this is hard-input Viterbi (~2 dB off the soft path —
    use ``disassemble_packet_soft`` when LLRs are available)."""
    assert bits.shape[-1] == pcfg.frame_bits, (bits.shape, pcfg.frame_bits)
    if pcfg.fec:
        from qpsk_tpu.packet.fec import hard_llrs
        return disassemble_packet_soft(pcfg, hard_llrs(bits))
    bits = unwrap_bits(pcfg, bits)
    return RxPacket(payload_bits=bits[..., :-16], crc_ok=crc16_check_bits(bits))


def disassemble_packet_soft(pcfg: PacketConfig, llrs: jnp.ndarray) -> RxPacket:
    """(..., frame_bits) received LLRs (positive = bit 0, see
    ``modmap.demod_soft``) → payload + CRC verdict.

    The whole RX frame pipeline runs in the soft domain: deinterleave is
    the same gather on floats, descramble is a keystream sign flip
    (XOR with bit 1 ≡ negate the LLR), then soft Viterbi when FEC is on.
    """
    assert llrs.shape[-1] == pcfg.frame_bits, (llrs.shape, pcfg.frame_bits)
    llrs = jnp.asarray(llrs, jnp.float32)
    if pcfg.interleave:
        llrs = deinterleave_bits(llrs)  # dtype-agnostic permutation gather
    if pcfg.scramble:
        ks = scramble_bits(jnp.zeros((pcfg.frame_bits,), jnp.int32),
                           pcfg.scramble_seed)
        llrs = llrs * (1 - 2 * ks).astype(jnp.float32)
    if pcfg.fec_kind == "conv":
        from qpsk_tpu.packet.fec import ConvCode, viterbi_decode
        bits = viterbi_decode(ConvCode(), llrs, pcfg.payload_crc_bits)
    elif pcfg.fec_kind == "ldpc":
        from qpsk_tpu.packet.ldpc import ldpc_decode
        bits = ldpc_decode(pcfg.ldpc_code(), llrs)
    else:
        bits = (llrs < 0).astype(jnp.int32)
    return RxPacket(payload_bits=bits[..., :-16], crc_ok=crc16_check_bits(bits))
