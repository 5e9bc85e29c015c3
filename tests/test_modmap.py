"""Gray map / slicer / upsample unit tests."""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops import modmap
from qpsk_tpu.ops.cplx import from_complex, to_complex


def test_constellation_values():
    # qpsk.c:58-63
    np.testing.assert_array_equal(
        modmap.CONSTELLATION,
        np.array([1, 1j, -1j, -1], dtype=np.complex64))


def test_mod_demod_roundtrip():
    """demod_bits inverts bits_to_symbols at the canonical Costas lock
    orientation (+45°, see demod_bits docstring)."""
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=512).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    locked = syms * np.exp(1j * np.pi / 4)
    back = modmap.demod_bits(from_complex(locked.astype(np.complex64)))
    np.testing.assert_array_equal(np.asarray(back), bits)


def test_dibit_swap_matches_reference():
    """qpsk.c:278-279: dibit[0]=tx_bits[s+1], dibit[1]=tx_bits[s];
    constellation index = (tx_bits[s]<<1) | tx_bits[s+1]."""
    for b0 in (0, 1):
        for b1 in (0, 1):
            sym = modmap.bits_to_symbols(jnp.asarray([b0, b1]))
            expect = modmap.CONSTELLATION[(b0 << 1) | b1]
            assert complex(to_complex(sym)[0]) == complex(expect)


def test_demod_rotation_tolerance():
    """Slicer decisions are stable under small phase noise around the
    diagonal lock — unlike the reference slicer, which is noise-decided
    there (demod_bits_reference docstring)."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=256).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    noisy = syms * np.exp(1j * (np.pi / 4 + 0.2)) + 0.05 * (
        rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape))
    back = modmap.demod_bits(from_complex(noisy.astype(np.complex64)))
    np.testing.assert_array_equal(np.asarray(back), bits)


def test_reference_slicer_coin_toss():
    """Document the reference defect: against the diagonal Costas lock, the
    rotate-45-then-sign slicer (qpsk.c:74-79) leaves one coordinate at ~0,
    so tiny noise flips bits — BER ~0.25 even with a perfect channel."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=4096).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    locked = syms * np.exp(1j * np.pi / 4) + 1e-4 * (
        rng.standard_normal(syms.shape) + 1j * rng.standard_normal(syms.shape))
    ref = np.asarray(modmap.demod_bits_reference(
        from_complex(locked.astype(np.complex64))))
    ber_ref = np.mean(ref ^ bits)
    assert 0.15 < ber_ref < 0.35  # one of two bits is a coin toss
    good = np.asarray(modmap.demod_bits(from_complex(locked.astype(np.complex64))))
    assert np.mean(good ^ bits) == 0.0


def test_upsample_zero_stuff():
    syms = from_complex(np.array([1 + 1j, -1 - 1j], dtype=np.complex64))
    up = to_complex(modmap.upsample_zero_stuff(syms, 4))
    expect = np.zeros(8, dtype=np.complex64)
    expect[0] = 1 + 1j
    expect[4] = -1 - 1j
    np.testing.assert_array_equal(up, expect)


def test_batched():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(4, 64)).astype(np.int32)
    syms = modmap.bits_to_symbols(jnp.asarray(bits))
    assert syms.shape == (4, 32)
    locked = to_complex(syms) * np.exp(1j * np.pi / 4)
    back = modmap.demod_bits(from_complex(locked.astype(np.complex64)))
    np.testing.assert_array_equal(np.asarray(back), bits)
