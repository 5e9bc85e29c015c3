"""Differential QPSK (DQPSK) encoding and decoding.

Capability extension over the reference: the C modem transmits absolute
Gray-coded QPSK and never resolves the Costas loop's 4-fold (90-deg) phase
ambiguity — its demod bits are discarded (qpsk.c:211).  qpsk_tpu resolves
the ambiguity by CRC (qpsk_tpu.sync); differential coding is the classic
alternative: encode each dibit as a phase *change*, so any constant
constellation rotation cancels in the decoder, and a Costas cycle slip
corrupts exactly one symbol instead of every symbol after it.

Mapping.  The reference constellation is ``{1, +j, -j, -1}`` indexed by
``(b1 << 1) | b0`` (qpsk.c:58-63), i.e. index -> quarter-turns
``m = P[idx]`` with ``P = [0, 1, 3, 2]`` (an involution: ``P == P^-1``).
Differential TX accumulates quarter-turns: ``a_k = (a_{k-1} + P[d_k]) mod 4``
and transmits ``exp(j*pi/2*a_k)`` — still the reference QPSK constellation
on air, so the Costas loop (costas_loop.c:44-47) is unchanged.

RX uses **coherent differential decoding**, not differential detection:
each Costas-locked symbol is sliced coherently to its quarter-turn (the
lock sits on the diagonals, so slicing happens after a fixed -45-deg
rotation), and the dibit is the *difference* of consecutive turn indices.
Against classic differential detection (``z_k = y_k * conj(y_{k-1})``,
which doubles the effective noise, ~2.3 dB penalty at QPSK rates) the
coherent form only pairs hard-decision errors (~0.3 dB penalty) — measured
here: CRC pass at 10 dB AWGN went from 0.55 (detection) to ~1.0 (coherent).
The residual Costas ambiguity is k*90 deg, which shifts every turn index
equally and cancels in the difference — rotation immunity is preserved.

TPU shape: the accumulator is a ``cumsum mod 4`` — fully parallel, no scan;
the decoder is one shifted complex multiply + sign logic, all VPU work.
Streaming carries are one int32 (TX phase index) and one CF32 symbol (RX
previous symbol) per channel, threaded through Tx/RxState.

Startup note: the very first decoded symbol after ``diff_rx_init`` differs
from absolute QPSK in that it measures against the carry's reference phasor
(1+0j), which the channel's unknown rotation does not multiply — it lands on
a decision boundary for the diagonal lock and is a coin toss.  Every symbol
after the first is rotation-immune.  Packet sync (qpsk_tpu.sync.find_sync)
already skips stream-head junk via its bit-lag search.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops.cplx import CF32, cmul

# index <-> quarter-turn permutation (involution), from the reference
# constellation order {1, +j, -j, -1} (qpsk.c:58-63).
_IDX_TO_TURN = np.array([0, 1, 3, 2], dtype=np.int32)
# exp(j*pi/2*a) for a in 0..3 — exact, no trig
_TURN_RE = np.array([1.0, 0.0, -1.0, 0.0], dtype=np.float32)
_TURN_IM = np.array([0.0, 1.0, 0.0, -1.0], dtype=np.float32)


def diff_tx_init(batch_shape=()) -> jnp.ndarray:
    """TX accumulator carry: absolute phase index, start at 0 (-> 1+0j)."""
    return jnp.zeros(batch_shape, jnp.int32)


def diff_rx_init(batch_shape=()) -> CF32:
    """RX carry: previous received symbol, init 1+0j (phase reference)."""
    from qpsk_tpu.ops.cplx import cones
    return cones(batch_shape)


def diff_encode_indices(indices: jnp.ndarray, carry: jnp.ndarray):
    """Dibit indices (..., n) + carry (...,) -> absolute phase indices.

    Returns (abs_idx (..., n) int32 in [0,4), new_carry (...,))."""
    turns = jnp.asarray(_IDX_TO_TURN)[indices]
    acc = carry[..., None] + jnp.cumsum(turns, axis=-1)
    abs_idx = jnp.mod(acc, 4)
    return abs_idx, abs_idx[..., -1]


def diff_encode_bits(bits: jnp.ndarray, carry: jnp.ndarray):
    """Bit stream (..., 2n) -> (symbols CF32 (..., n), new_carry).

    Bit order matches the reference dibit packing (qpsk.c:273-285):
    index = (bits[2i] << 1) | bits[2i+1]."""
    b = bits.reshape(bits.shape[:-1] + (-1, 2)).astype(jnp.int32)
    idx = (b[..., 0] << 1) | b[..., 1]
    abs_idx, carry = diff_encode_indices(idx, carry)
    sym = CF32(jnp.asarray(_TURN_RE)[abs_idx], jnp.asarray(_TURN_IM)[abs_idx])
    return sym, carry


def quantize_turns(z: CF32) -> jnp.ndarray:
    """Nearest quarter-turn of each phasor: argmax_m Re{z * e^{-j*pi/2*m}},
    computed with sign/magnitude tests (no trig, no 4-way gather)."""
    axis_major = jnp.abs(z.re) >= jnp.abs(z.im)
    m_axis = jnp.where(z.re >= 0, 0, 2)
    m_diag = jnp.where(z.im >= 0, 1, 3)
    return jnp.where(axis_major, m_axis, m_diag).astype(jnp.int32)


_COS45 = np.float32(np.cos(np.pi / 4))


def diff_decode_symbols(symbols: CF32, carry: CF32):
    """Received symbols (..., n) + previous-symbol carry -> bits (..., 2n).

    Coherent differential decode: rotate the diagonal Costas lock back onto
    the axes (fixed -45 deg), slice every symbol to its quarter-turn, and
    take consecutive differences mod 4.  Any residual k*90-deg lock
    rotation (and the double-GAIN amplitude) cancels in the difference.
    Returns (bits, new_carry = last received symbol)."""
    full = CF32(
        jnp.concatenate([carry.re[..., None], symbols.re], axis=-1),
        jnp.concatenate([carry.im[..., None], symbols.im], axis=-1))
    rot = cmul(full, CF32(_COS45, -_COS45))      # e^{-j*pi/4}, unnormalized
    m = quantize_turns(rot)
    d = jnp.mod(m[..., 1:] - m[..., :-1], 4)
    idx = jnp.asarray(_IDX_TO_TURN)[d]           # P is its own inverse
    bits = jnp.stack([(idx >> 1) & 1, idx & 1], axis=-1)
    new_carry = CF32(symbols.re[..., -1], symbols.im[..., -1])
    return bits.reshape(symbols.shape[:-1] + (-1,)), new_carry
