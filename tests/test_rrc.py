"""RRC designer + block FIR unit tests."""

import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops import rrc
from qpsk_tpu.ops.cplx import from_complex, to_complex


def test_design_shape_and_gain_norm():
    taps = rrc.rrc_design(9600.0, 2400.0, 0.35)
    assert taps.shape == (127,)
    assert taps.dtype == np.float32
    # normalization bakes GAIN into the taps (rrc_fir.c:73-75)
    assert abs(taps.sum() - 1.85) < 1e-5
    # symmetric linear-phase pulse
    np.testing.assert_allclose(taps, taps[::-1], rtol=0, atol=1e-6)
    # center tap is the peak
    assert taps.argmax() == 63


def test_design_1200_baud():
    taps = rrc.rrc_design(9600.0, 1200.0, 0.35)
    assert abs(taps.sum() - 1.85) < 1e-5
    assert taps.argmax() == 63


def _rand_cplx(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


def test_fir_block_matches_reference_order():
    rng = np.random.default_rng(0)
    taps = rrc.rrc_design(9600.0, 2400.0, 0.35)
    x = _rand_cplx(rng, 512)
    tail = rrc.fir_init_tail(127)
    tmat = jnp.asarray(rrc.toeplitz_taps(taps, 256))
    y_blk, tail_blk = rrc.fir_block(from_complex(x), tail, tmat, 1.85, 256)
    y_ref = rrc.fir_reference_order(from_complex(x), tail, jnp.asarray(taps), 1.85)
    np.testing.assert_allclose(to_complex(y_blk), to_complex(y_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(to_complex(tail_blk), x[-126:])


def test_fir_block_streaming_matches_one_shot():
    """Chaining blocks with the carried tail == filtering the whole stream."""
    rng = np.random.default_rng(1)
    taps = rrc.rrc_design(9600.0, 2400.0, 0.35)
    tmat = jnp.asarray(rrc.toeplitz_taps(taps, 128))
    n = 1024
    x = _rand_cplx(rng, n)

    y_full, _ = rrc.fir_block(from_complex(x), rrc.fir_init_tail(127), tmat,
                              1.85, 128)

    tail = rrc.fir_init_tail(127)
    pieces = []
    for i in range(0, n, 256):
        y, tail = rrc.fir_block(from_complex(x[i:i + 256]), tail, tmat, 1.85, 128)
        pieces.append(to_complex(y))
    y_stream = np.concatenate(pieces)
    np.testing.assert_allclose(y_stream, to_complex(y_full), rtol=1e-6, atol=1e-6)


def test_fir_block_batched():
    rng = np.random.default_rng(2)
    taps = rrc.rrc_design(9600.0, 2400.0, 0.35)
    tmat = jnp.asarray(rrc.toeplitz_taps(taps, 128))
    x = _rand_cplx(rng, (3, 256))
    tail = rrc.fir_init_tail(127, (3,))
    y, new_tail = rrc.fir_block(from_complex(x), tail, tmat, 1.85, 128)
    assert y.shape == (3, 256)
    assert new_tail.shape == (3, 126)
    for c in range(3):
        y1, _ = rrc.fir_block(from_complex(x[c]), rrc.fir_init_tail(127), tmat,
                              1.85, 128)
        np.testing.assert_allclose(to_complex(y)[c], to_complex(y1),
                                   rtol=1e-6, atol=1e-6)


def test_fir_against_numpy_convolve():
    """The Toeplitz matmul equals numpy's direct convolution with the
    C alignment y[t] = sum_k c[k] x[t-126+k]."""
    rng = np.random.default_rng(3)
    taps = rrc.rrc_design(9600.0, 2400.0, 0.35)
    n = 512
    x = _rand_cplx(rng, n)
    x_ext = np.concatenate([np.zeros(126, np.complex64), x])
    expect = np.empty(n, np.complex64)
    for t in range(n):
        expect[t] = (x_ext[t:t + 127] * taps).sum() * np.float32(1.85)
    tmat = jnp.asarray(rrc.toeplitz_taps(taps, 128))
    y, _ = rrc.fir_block(from_complex(x), rrc.fir_init_tail(127), tmat, 1.85, 128)
    np.testing.assert_allclose(to_complex(y), expect, rtol=3e-5, atol=3e-5)
