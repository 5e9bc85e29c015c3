"""Gray-coded QPSK symbol mapping and slicing.

Replicates the reference constellation and bit conventions exactly:

* constellation {1, +j, -j, -1} indexed by ``(b1 << 1) | b0`` (qpsk.c:58-63,
  269-271) — adjacent quadrants differ in one bit (Gray code);
* the TX dibit packing *swap*: ``dibit[0] = tx_bits[s+1]``,
  ``dibit[1] = tx_bits[s]`` (qpsk.c:278-279), so the constellation index for
  symbol ``i`` is ``(tx_bits[2i] << 1) | tx_bits[2i+1]``;
* the slicer: rotate by +45 degrees then sign-test,
  ``b0 = Re < 0``, ``b1 = Im < 0`` (qpsk.c:74-79).

Everything is vectorized over arbitrary leading batch axes and uses the
split-plane CF32 representation (no complex dtypes on the TPU backend).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops.cplx import CF32, cmul

TAU = 2.0 * math.pi
ROTATE45 = math.pi / 4.0

# constellation[(b1<<1)|b0] (qpsk.c:58-63)
CONSTELLATION = np.array([1.0 + 0.0j, 0.0 + 1.0j, 0.0 - 1.0j, -1.0 + 0.0j],
                         dtype=np.complex64)
_CONST_RE = np.real(CONSTELLATION).astype(np.float32)
_CONST_IM = np.imag(CONSTELLATION).astype(np.float32)


def mod_symbols(indices: jnp.ndarray) -> CF32:
    """Constellation lookup for integer indices in [0, 4)."""
    return CF32(jnp.asarray(_CONST_RE)[indices], jnp.asarray(_CONST_IM)[indices])


def bits_to_symbols(bits: jnp.ndarray) -> CF32:
    """Pack a bit stream (..., 2*n) into n QPSK symbols with the reference
    dibit order (qpsk.c:273-285): index = (bits[2i] << 1) | bits[2i+1]."""
    b = bits.reshape(bits.shape[:-1] + (-1, 2)).astype(jnp.int32)
    idx = (b[..., 0] << 1) | b[..., 1]
    return mod_symbols(idx)


def demod_bits(symbols: CF32) -> jnp.ndarray:
    """Slice symbols (..., n) back to bits (..., 2*n), inverting
    ``bits_to_symbols`` (Gray slicer, qpsk.c:74-79).

    b0 = Re(sym * e^{j pi/4}) < 0 ; b1 = Im(...) < 0 ;
    recovered stream order is [b1, b0] per symbol (undoing the TX swap).
    """
    rot45 = CF32(jnp.float32(math.cos(ROTATE45)), jnp.float32(math.sin(ROTATE45)))
    rot = cmul(symbols, rot45)
    b0 = (rot.re < 0.0)
    b1 = (rot.im < 0.0)
    bits = jnp.stack([b1, b0], axis=-1).astype(jnp.int32)
    return bits.reshape(symbols.shape[:-1] + (-1,))


def upsample_zero_stuff(symbols: CF32, cycles: int) -> CF32:
    """Zero-stuff upsample by ``cycles`` (qpsk.c:232-237): the symbol lands on
    phase 0 of each group, the remaining ``cycles - 1`` slots are zero."""

    def one(plane):
        shape = plane.shape[:-1] + (plane.shape[-1], cycles)
        out = jnp.zeros(shape, dtype=plane.dtype)
        out = out.at[..., 0].set(plane)
        return out.reshape(plane.shape[:-1] + (plane.shape[-1] * cycles,))

    return CF32(one(symbols.re), one(symbols.im))
