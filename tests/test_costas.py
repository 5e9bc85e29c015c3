"""Costas loop unit tests."""

import math

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops import costas, modmap
from qpsk_tpu.ops.cplx import from_complex, to_complex

TAU = 2.0 * math.pi


def test_gain_formula():
    # costas_loop.c:49-54 with bw=TAU/100, damping=sqrt(2)/2
    p = costas.costas_params(TAU / 100.0)
    d, w = math.sqrt(2) / 2, TAU / 100.0
    denom = 1 + 2 * d * w + w * w
    assert abs(float(p.alpha) - 4 * d * w / denom) < 1e-7
    assert abs(float(p.beta) - 4 * w * w / denom) < 1e-7


def test_phase_detector_signs():
    # costas_loop.c:44-47
    z = from_complex(np.array([1 + 0.1j, -1 + 0.1j, 0.1 - 1j, -0.1 - 1j],
                              dtype=np.complex64))
    e = np.asarray(costas.phase_detector(z))
    expect = np.array([
        1 * 0.1 - 1 * 1,        # re>0, im>0
        -1 * 0.1 - 1 * (-1),    # re<0, im>0
        1 * (-1) - (-1) * 0.1,  # re>0, im<0
        -1 * (-1) - (-1) * (-0.1),
    ], dtype=np.float32)
    np.testing.assert_allclose(e, expect, rtol=1e-6)


DIAG = modmap.CONSTELLATION * np.exp(1j * np.pi / 4).astype(np.complex64)


def test_detector_zero_at_lock():
    """The detector's zero-set is the diagonals: the loop locks the axis
    constellation rotated 45 degrees, matching the reference's converged
    scatter clusters at (+-1.05, +-1.00) (BASELINE.md)."""
    z = from_complex(DIAG.astype(np.complex64))
    np.testing.assert_allclose(np.asarray(costas.phase_detector(z)),
                               np.zeros(4), atol=1e-6)
    # axis points (pre-lock) produce unit-magnitude error
    z2 = from_complex(modmap.CONSTELLATION)
    np.testing.assert_allclose(np.abs(np.asarray(costas.phase_detector(z2))),
                               np.ones(4), atol=1e-6)


def _run_loop(freq_offset_radsym, nsym=2000, seed=0, snr_db=None):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=2 * nsym).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    rot = syms * np.exp(1j * freq_offset_radsym * np.arange(nsym))
    if snr_db is not None:
        sigma = math.sqrt(0.5 / (10 ** (snr_db / 10.0)))
        rot = rot + sigma * (rng.standard_normal(nsym)
                             + 1j * rng.standard_normal(nsym))
    p = costas.costas_params(TAU / 100.0)
    st = costas.costas_init()
    st, out = costas.costas_run(st, from_complex(rot.astype(np.complex64)), p)
    return st, to_complex(out), bits


def _evm(points):
    """RMS distance to the nearest *diagonal* lock point (the loop locks the
    axis constellation rotated 45 degrees, with 4-fold ambiguity)."""
    dist = np.min(np.abs(points[:, None] - DIAG[None, :]), axis=1)
    return float(np.sqrt(np.mean(dist ** 2)))


def test_acquires_freq_offset():
    """+50 Hz at 2400 baud = 0.1309 rad/symbol (the reference stimulus,
    qpsk.c:320-321): the loop must converge to it."""
    offset = TAU * 50.0 / 2400.0
    st, out, bits = _run_loop(offset)
    assert abs(float(st.freq) - offset) < 0.01
    # post-convergence symbols decode tightly (up to the 90-degree lock
    # ambiguity, so measure EVM against the nearest constellation point)
    assert _evm(out[1000:]) < 0.15


def test_acquires_negative_offset_with_noise():
    offset = -TAU * 30.0 / 2400.0
    st, out, _ = _run_loop(offset, snr_db=15, seed=3)
    assert abs(float(st.freq) - offset) < 0.02


def test_frequency_clamp():
    p = costas.costas_params(TAU / 100.0, min_freq=-0.05, max_freq=0.05)
    st = costas.costas_init()
    z = from_complex(np.full(500, 1 + 1j, dtype=np.complex64))  # persistent error
    st, _ = costas.costas_run(st, z, p)
    assert -0.05 <= float(st.freq) <= 0.05


def test_phase_stays_wrapped():
    st, _, _ = _run_loop(0.3, nsym=5000)
    assert -TAU <= float(st.phase) <= TAU


def test_batched_channels_independent():
    """vmapped batch == per-channel runs."""
    rng = np.random.default_rng(7)
    nsym, nch = 256, 4
    z = (rng.standard_normal((nch, nsym)) + 1j * rng.standard_normal((nch, nsym))
         ).astype(np.complex64)
    p = costas.costas_params(TAU / 100.0)
    st = costas.costas_init((nch,))
    st_b, out_b = costas.costas_run(st, from_complex(z), p)
    out_b = to_complex(out_b)
    for c in range(nch):
        st1, out1 = costas.costas_run(costas.costas_init(), from_complex(z[c]), p)
        np.testing.assert_allclose(out_b[c], to_complex(out1), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(st_b.freq[c]), float(st1.freq),
                                   rtol=1e-6, atol=1e-6)


def test_warm_start_from_acquisition():
    """Seeding the loop with the true frequency keeps EVM low from the
    first symbol (the FFT-acquisition path)."""
    offset = TAU * 100.0 / 2400.0
    rng = np.random.default_rng(9)
    nsym = 500
    bits = rng.integers(0, 2, size=2 * nsym).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    rot = syms * np.exp(1j * offset * np.arange(nsym))
    p = costas.costas_params(TAU / 100.0)
    st = costas.costas_init(freq=offset)
    st, out = costas.costas_run(st, from_complex(rot.astype(np.complex64)), p)
    # a short phase transient remains (axis -> diagonal lock), but the loop
    # must be settled well within 100 symbols and hold the seeded frequency
    assert _evm(to_complex(out)[100:]) < 0.05
    assert abs(float(st.freq) - offset) < 0.01
