"""CostasLoop facade: API parity with costas_loop.h's setter/getter set."""

import math

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops import costas as costas_ops
from qpsk_tpu.ops.costas import CostasLoop
from qpsk_tpu.ops.cplx import CF32

TAU = 2 * math.pi


def test_gain_schedule_matches_reference_formula():
    # costas_loop.c:49-54: denom = 1 + 2 d w + w^2; a = 4dw/denom; b = 4w^2/denom
    loop = CostasLoop(TAU / 100.0)
    w, d = TAU / 100.0, math.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * d * w + w * w
    assert abs(loop.get_alpha() - 4 * d * w / denom) < 1e-7
    assert abs(loop.get_beta() - 4 * w * w / denom) < 1e-7


def test_setters_getters_roundtrip():
    loop = CostasLoop(TAU / 100.0)
    loop.set_loop_bandwidth(TAU / 200.0)
    assert loop.get_loop_bandwidth() == TAU / 200.0
    loop.set_damping_factor(0.5)
    assert loop.get_damping_factor() == 0.5
    loop.set_alpha(0.1)
    loop.set_beta(0.01)
    assert abs(loop.get_alpha() - 0.1) < 1e-7  # float32 round trip
    assert abs(loop.get_beta() - 0.01) < 1e-7
    loop.set_loop_bandwidth(TAU / 100.0)   # update_gains resets overrides
    assert loop.get_alpha() != 0.1
    loop.set_max_freq(0.5)
    loop.set_min_freq(-0.5)
    loop.set_frequency(2.0)                # clamped (costas_loop.c:117-125)
    assert float(loop.get_frequency()) == 0.5
    loop.set_phase(TAU + 0.25)             # wrapped (costas_loop.c:127-132)
    assert abs(float(loop.get_phase()) - 0.25) < 1e-5


def test_facade_tracks_like_functional_core():
    rng = np.random.default_rng(0)
    z = CF32(jnp.asarray(rng.normal(size=64).astype(np.float32)),
             jnp.asarray(rng.normal(size=64).astype(np.float32)))
    loop = CostasLoop(TAU / 100.0)
    out = loop(z)
    params = costas_ops.costas_params(TAU / 100.0)
    st, out_ref = costas_ops.costas_run(costas_ops.costas_init(()), z, params)
    np.testing.assert_array_equal(np.asarray(out.re), np.asarray(out_ref.re))
    np.testing.assert_array_equal(np.asarray(loop.get_frequency()),
                                  np.asarray(st.freq))
