"""Fused Pallas LDPC kernel vs the XLA twin (interpret mode on the CPU
mesh; tools/check_ldpc_tpu.py runs the same comparison on hardware)."""

import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops.pallas.ldpc_kernel import ldpc_decode_pallas
from qpsk_tpu.packet.ldpc import LdpcCode, ldpc_decode, ldpc_encode


def _noisy(rng, code, batch, sigma):
    u = jnp.asarray(rng.integers(0, 2, batch + (code.k,), dtype=np.int64))
    x = 1.0 - 2.0 * np.asarray(ldpc_encode(code, u), np.float32)
    return u, jnp.asarray(x + rng.normal(0, sigma, x.shape)
                          .astype(np.float32))


def test_matches_xla_across_sizes():
    rng = np.random.default_rng(0)
    for k, batch in ((256, (48,)), (128, (3, 7)), (64, (5,))):
        code = LdpcCode(k=k)
        _, llrs = _noisy(rng, code, batch, 0.7)
        a = np.asarray(ldpc_decode_pallas(code, llrs, interpret=True))
        b = np.asarray(ldpc_decode(code, llrs, impl="xla"))
        # the kernel sums variable totals slot-by-slot, XLA in one matmul:
        # different f32 orders, so allow (unobserved so far) tie flips
        assert (a == b).mean() >= 0.999, (k, (a == b).mean())


def test_decodes_through_noise():
    rng = np.random.default_rng(2)
    code = LdpcCode(k=256)
    u, llrs = _noisy(rng, code, (64,), 0.6)   # ~4.4 dB: clean decode
    dec = np.asarray(ldpc_decode_pallas(code, llrs, interpret=True))
    assert (dec == np.asarray(u)).all()


def test_iters_override_and_unpadded_batch():
    rng = np.random.default_rng(3)
    code = LdpcCode(k=128)
    _, llrs = _noisy(rng, code, (9,), 0.5)
    a = np.asarray(ldpc_decode_pallas(code, llrs, iters=8, interpret=True))
    b = np.asarray(ldpc_decode(code, llrs, iters=8, impl="xla"))
    assert (a == b).mean() >= 0.999
    assert a.shape == (9, 128)
