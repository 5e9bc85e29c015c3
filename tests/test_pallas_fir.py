"""Pallas overlap-save FIR kernel vs the XLA Toeplitz lowering."""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu import ModemConfig
from qpsk_tpu.modem import _tmat_for, taps_for
from qpsk_tpu.ops import rrc as rrc_ops
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.pallas.fir_kernel import fir_block_pallas

CFG = ModemConfig()


def test_fir_pallas_matches_xla():
    rng = np.random.default_rng(0)
    c, n = 16, 2048
    x = CF32(jnp.asarray(rng.normal(size=(c, n)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(c, n)).astype(np.float32)))
    tail = CF32(jnp.asarray(rng.normal(size=(c, 126)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(c, 126)).astype(np.float32)))
    y_ref, t_ref = rrc_ops.fir_block(
        x, tail, jnp.asarray(_tmat_for(CFG, 512)), CFG.gain, 512)
    y_p, t_p = fir_block_pallas(x, taps_for(CFG), tail, CFG.gain, 512,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(y_p.re), np.asarray(y_ref.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_p.im), np.asarray(y_ref.im),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t_p.re), np.asarray(t_ref.re))


def test_fir_pallas_streaming_tail_chain():
    """Two chained calls equal one long call (the overlap-save carry)."""
    rng = np.random.default_rng(1)
    c, n = 8, 1024
    x = CF32(jnp.asarray(rng.normal(size=(c, 2 * n)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(c, 2 * n)).astype(np.float32)))
    taps = taps_for(CFG)
    tail0 = rrc_ops.fir_init_tail(CFG.ntaps, (c,))
    y_full, _ = fir_block_pallas(x, taps, tail0, CFG.gain, 512,
                                 interpret=True)
    x1 = CF32(x.re[:, :n], x.im[:, :n])
    x2 = CF32(x.re[:, n:], x.im[:, n:])
    y1, t1 = fir_block_pallas(x1, taps, tail0, CFG.gain, 512, interpret=True)
    y2, _ = fir_block_pallas(x2, taps, t1, CFG.gain, 512, interpret=True)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y1.re), np.asarray(y2.re)], -1),
        np.asarray(y_full.re))
