"""Pallas Costas kernel vs the lax.scan reference (interpret mode on CPU;
the same assertions were verified bit-exact on TPU v5e hardware)."""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops import costas as costas_ops
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas_traced


def _random_symbols(c, t, seed=0):
    rng = np.random.default_rng(seed)
    return CF32(jnp.asarray(rng.normal(size=(c, t)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(c, t)).astype(np.float32)))


def test_pallas_matches_scan_bitexact():
    c, t = 256, 256
    params = costas_ops.costas_params(0.0628)
    state = costas_ops.costas_init((c,), freq=0.05)
    z = _random_symbols(c, t)
    st_ref, out_ref, ft_ref = costas_ops.costas_run_traced(state, z, params)
    st_p, out_p, ft_p = costas_run_pallas_traced(state, z, params,
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(out_ref.re), np.asarray(out_p.re))
    np.testing.assert_array_equal(np.asarray(out_ref.im), np.asarray(out_p.im))
    np.testing.assert_array_equal(np.asarray(ft_ref), np.asarray(ft_p))
    np.testing.assert_array_equal(np.asarray(st_ref.phase), np.asarray(st_p.phase))
    np.testing.assert_array_equal(np.asarray(st_ref.freq), np.asarray(st_p.freq))


def test_pallas_multi_tile_grid():
    """Channel and time tiling (grid > 1 in both axes) preserves the carry."""
    c, t = 384, 96   # ct=128 tiles x 3, multiple T tiles
    params = costas_ops.costas_params(0.0628)
    state = costas_ops.costas_init((c,), phase=0.3, freq=-0.02)
    z = _random_symbols(c, t, seed=1)
    st_ref, out_ref = costas_ops.costas_run(state, z, params)
    st_p, out_p, _ = costas_run_pallas_traced(state, z, params, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_ref.re), np.asarray(out_p.re))
    np.testing.assert_array_equal(np.asarray(st_ref.freq), np.asarray(st_p.freq))


def test_pallas_wide_channel_tile():
    """Wide channel counts fold onto all 8 sublanes in one grid step
    (c=4096 -> sg=8 x 512 lanes) and stay bit-exact against the scan."""
    c, t = 4096, 16
    from qpsk_tpu.ops.pallas.costas_kernel import _pick_tiles
    sg, lt, _ = _pick_tiles(c, t)
    assert sg == 8 and sg * lt == 4096
    params = costas_ops.costas_params(0.0628)
    state = costas_ops.costas_init((c,), phase=0.1, freq=0.03)
    z = _random_symbols(c, t, seed=2)
    st_ref, out_ref = costas_ops.costas_run(state, z, params)
    st_p, out_p, _ = costas_run_pallas_traced(state, z, params, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_ref.re), np.asarray(out_p.re))
    np.testing.assert_array_equal(np.asarray(out_ref.im), np.asarray(out_p.im))
    np.testing.assert_array_equal(np.asarray(st_ref.phase), np.asarray(st_p.phase))
    np.testing.assert_array_equal(np.asarray(st_ref.freq), np.asarray(st_p.freq))
