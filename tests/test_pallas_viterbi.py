"""Fused Pallas Viterbi kernels vs the lax.scan twin (interpret mode on
the CPU mesh; tools/check_viterbi_tpu.py runs the same comparison on
hardware)."""

import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops.pallas.viterbi_kernel import viterbi_decode_pallas
from qpsk_tpu.packet.fec import (ConvCode, conv_encode, hard_llrs,
                                 viterbi_decode)

CODE = ConvCode()


def _noisy(rng, nbits, batch, sigma):
    u = jnp.asarray(rng.integers(0, 2, batch + (nbits,), dtype=np.int64))
    x = 1.0 - 2.0 * np.asarray(conv_encode(CODE, u), np.float32)
    return u, jnp.asarray(x + rng.normal(0, sigma, x.shape)
                          .astype(np.float32))


def test_matches_scan_soft():
    rng = np.random.default_rng(0)
    for nbits, batch in ((256, (48,)), (238, (5,)), (100, (3, 7))):
        _, llrs = _noisy(rng, nbits, batch, 0.7)
        a = np.asarray(viterbi_decode_pallas(CODE, llrs, nbits,
                                             interpret=True))
        b = np.asarray(viterbi_decode(CODE, llrs, nbits, impl="scan"))
        np.testing.assert_array_equal(a, b)


def test_matches_scan_hard_ties():
    """Hard LLRs (+-1) tie constantly; both lowerings must break ties the
    same way (lowest index) — exact arithmetic end to end."""
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, 2, (32, 256), dtype=np.int64))
    c = np.asarray(conv_encode(CODE, u))
    flips = (rng.random(c.shape) < 0.03).astype(np.int64)
    llrs = hard_llrs(jnp.asarray((c + flips) % 2))
    a = np.asarray(viterbi_decode_pallas(CODE, llrs, 256, interpret=True))
    b = np.asarray(viterbi_decode(CODE, llrs, 256, impl="scan"))
    np.testing.assert_array_equal(a, b)


def test_decodes_through_noise():
    rng = np.random.default_rng(2)
    u, llrs = _noisy(rng, 256, (64,), 0.55)   # ~Eb/N0 5 dB: clean decode
    dec = np.asarray(viterbi_decode_pallas(CODE, llrs, 256,
                                           interpret=True))
    assert (dec == np.asarray(u)).all()


def test_unpadded_batch_and_length():
    """Batch not a lane multiple and nsteps not a tile multiple both pad
    internally and slice back."""
    rng = np.random.default_rng(3)
    u, llrs = _noisy(rng, 77, (9,), 0.4)
    dec = np.asarray(viterbi_decode_pallas(CODE, llrs, 77, interpret=True))
    assert dec.shape == (9, 77)
    assert (dec == np.asarray(u)).all()
