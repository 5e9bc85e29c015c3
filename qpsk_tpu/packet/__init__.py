"""Packet protocol layer.

The reference ships four standalone, *unwired* packet primitives under
``algorithms/`` (SURVEY.md C13-C16) — CRC16, a DVB additive bit scrambler, a
golden-prime interleaver, and an FFT.  Here they are first-class, integrated
components of the frame pipeline (qpsk_tpu.packet.frame), vectorized over
batch axes and jit-friendly.
"""

from qpsk_tpu.packet.bits import (bits_to_bytes, bytes_to_bits, dibits_to_bits,
                                  bits_to_dibits)
from qpsk_tpu.packet.crc16 import crc16, crc16_np
from qpsk_tpu.packet.scramble import keystream, scramble_bits
from qpsk_tpu.packet.interleave import (interleave_bits, deinterleave_bits,
                                        interleave_permutation)
from qpsk_tpu.packet.frame import (PacketConfig, assemble_packet,
                                   disassemble_packet,
                                   disassemble_packet_soft)
from qpsk_tpu.packet.fec import (ConvCode, conv_encode, viterbi_decode,
                                 hard_llrs)
from qpsk_tpu.packet.ldpc import (LdpcCode, ldpc_encode, ldpc_decode,
                                  ldpc_syndrome_weight)
