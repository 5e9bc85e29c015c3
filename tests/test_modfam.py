"""Unit tests for the generic modulation family (ops/modfam.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsk_tpu.ops import modfam
from qpsk_tpu.ops.cplx import CF32

MODS = ["bpsk", "8psk", "16qam"]


def _rand_bits(rng, n):
    return jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))


@pytest.mark.parametrize("name", MODS)
def test_unit_average_power(name):
    m = modfam.get(name)
    p = np.mean(m.points_re ** 2 + m.points_im ** 2)
    assert abs(p - 1.0) < 1e-6


@pytest.mark.parametrize("name", MODS)
def test_labels_bits_round_trip(name):
    m = modfam.get(name)
    rng = np.random.default_rng(0)
    bits = _rand_bits(rng, 64 * m.bps)
    lab = modfam.bits_to_labels(bits, m)
    assert np.array_equal(np.asarray(modfam.labels_to_bits(lab, m)), bits)


@pytest.mark.parametrize("name", MODS)
def test_mod_demod_round_trip_noiseless(name):
    m = modfam.get(name)
    rng = np.random.default_rng(1)
    bits = _rand_bits(rng, 256 * m.bps)
    sym = modfam.bits_to_symbols_mod(bits, m)
    out = modfam.demod_bits_mod(sym, m)
    assert np.array_equal(np.asarray(out), bits)


@pytest.mark.parametrize("name", MODS)
def test_slicer_scale_matters_only_for_qam(name):
    """PSK decisions are scale-free; 16QAM decisions are scale-true, so a
    matched ``scale`` recovers a scaled cloud exactly."""
    m = modfam.get(name)
    rng = np.random.default_rng(2)
    bits = _rand_bits(rng, 128 * m.bps)
    sym = modfam.bits_to_symbols_mod(bits, m)
    scaled = CF32(sym.re * 1.45, sym.im * 1.45)
    out = modfam.demod_bits_mod(scaled, m, scale=1.45)
    assert np.array_equal(np.asarray(out), bits)
    if name != "16qam":
        out1 = modfam.demod_bits_mod(scaled, m, scale=1.0)
        assert np.array_equal(np.asarray(out1), bits)


@pytest.mark.parametrize("name", MODS)
def test_gray_adjacency(name):
    """Nearest-neighbor constellation points differ in exactly one bit."""
    m = modfam.get(name)
    pts = m.points_re + 1j * m.points_im
    d = np.abs(pts[:, None] - pts[None, :])
    np.fill_diagonal(d, np.inf)
    dmin = d.min()
    for k in range(m.M):
        for j in range(m.M):
            if abs(d[k, j] - dmin) < 1e-6:
                assert bin(k ^ j).count("1") == 1, (k, j)


@pytest.mark.parametrize("name", MODS)
def test_rotation_group(name):
    """rot_labels is a cyclic relabeling group of order n_rot, and one
    channel rotation step is undone by hypothesis r=1."""
    m = modfam.get(name)
    for r in range(m.n_rot):
        assert sorted(m.rot_labels[r].tolist()) == list(range(m.M))
    # applying the r=1 relabel n_rot times is the identity
    lab = np.arange(m.M)
    for _ in range(m.n_rot):
        lab = m.rot_labels[1][lab]
    assert np.array_equal(lab, np.arange(m.M))


@pytest.mark.parametrize("name", MODS)
@pytest.mark.parametrize("r", [1, 2])
def test_rotation_hypothesis_recovers_bits(name, r):
    """A channel rotating the constellation by r ambiguity steps is undone
    by demod under rotation hypothesis r (the sync hunt's contract)."""
    m = modfam.get(name)
    r = r % m.n_rot
    rng = np.random.default_rng(3)
    bits = _rand_bits(rng, 128 * m.bps)
    sym = modfam.bits_to_symbols_mod(bits, m)
    ang = 2.0 * np.pi * r / m.n_rot
    c, s = np.float32(np.cos(ang)), np.float32(np.sin(ang))
    rot = CF32(sym.re * c - sym.im * s, sym.re * s + sym.im * c)
    out = modfam.demod_bits_mod(rot, m, rotation=r)
    assert np.array_equal(np.asarray(out), bits)
    # and the bit-domain re-slicer agrees (static and traced r)
    raw = modfam.demod_bits_mod(rot, m)
    assert np.array_equal(
        np.asarray(modfam.rotate_bits_mod(raw, r, m)), bits)
    assert np.array_equal(
        np.asarray(modfam.rotate_bits_mod(raw, jnp.int32(r), m)), bits)


@pytest.mark.parametrize("name", MODS)
def test_soft_agrees_with_hard(name):
    """LLR signs reproduce the hard decisions (positive = bit 0), on and
    off rotation hypotheses, under noise."""
    m = modfam.get(name)
    rng = np.random.default_rng(4)
    bits = _rand_bits(rng, 256 * m.bps)
    sym = modfam.bits_to_symbols_mod(bits, m)
    key = jax.random.key(0)
    noisy = CF32(sym.re + 0.05 * jax.random.normal(key, sym.re.shape),
                 sym.im + 0.05 * jax.random.normal(
                     jax.random.key(1), sym.im.shape))
    for r in (0, 1):
        hard = np.asarray(modfam.demod_bits_mod(noisy, m, rotation=r))
        llr = np.asarray(modfam.demod_soft_mod(noisy, m, rotation=r))
        assert np.array_equal((llr < 0).astype(np.int32), hard)


@pytest.mark.parametrize("name", MODS)
def test_dd_detector_sign_and_zero(name):
    """The decision-directed error is ~0 on constellation points and has
    the sign of a small phase offset."""
    m = modfam.get(name)
    det = modfam.dd_detector(m)
    pts = CF32(jnp.asarray(m.points_re), jnp.asarray(m.points_im))
    assert np.max(np.abs(np.asarray(det(pts)))) < 1e-5
    for dphi in (0.02, -0.02):
        c, s = np.float32(np.cos(dphi)), np.float32(np.sin(dphi))
        rot = CF32(pts.re * c - pts.im * s, pts.re * s + pts.im * c)
        err = np.asarray(det(rot))
        assert np.all(np.sign(err) == np.sign(dphi)), (dphi, err)
        # approximately radians
        np.testing.assert_allclose(err, dphi, rtol=0.3)


def test_evm_mod_zero_on_ideal():
    for name in MODS:
        m = modfam.get(name)
        rng = np.random.default_rng(5)
        bits = _rand_bits(rng, 64 * m.bps)
        sym = modfam.bits_to_symbols_mod(bits, m)
        assert float(modfam.evm_mod(sym, m, normalize=False)) < 1e-6
        # normalized: the SAMPLE RMS differs from the ensemble unit power
        # (16QAM rings), so ideal symbols read a small finite-sample EVM
        scaled = CF32(sym.re * 1.45, sym.im * 1.45)  # chain gain
        assert float(modfam.evm_mod(scaled, m)) < 0.08
