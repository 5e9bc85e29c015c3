"""Checkpoint, debug-tap, and multihost-helper tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from qpsk_tpu import ModemConfig, rx_init
from qpsk_tpu.modem import rx_frame
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.parallel import multihost
from qpsk_tpu.utils import load_state, save_state
from qpsk_tpu.utils.debug import ScatterTap, assert_finite, eager_assert_finite

CFG = ModemConfig()


def test_checkpoint_roundtrip(tmp_path):
    state = rx_init(CFG, batch_shape=(3,))
    # mutate so it isn't trivially zeros
    state = state._replace(costas=state.costas._replace(
        freq=jnp.full((3,), 0.25)))
    path = str(tmp_path / "state.npz")
    save_state(path, state)
    restored = load_state(path, rx_init(CFG, batch_shape=(3,)))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_stream(tmp_path):
    """Demodulating 4 frames straight == demodulating 2, checkpointing,
    restoring, and demodulating 2 more (streaming resume, SURVEY.md §5)."""
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.integers(-8192, 8192, (4, CFG.frame_size),
                                   dtype=np.int16))
    st = rx_init(CFG)
    outs_direct = []
    for k in range(4):
        st, o = rx_frame(CFG, st, pcm[k])
        outs_direct.append(np.asarray(o.symbols.re))

    st = rx_init(CFG)
    for k in range(2):
        st, o = rx_frame(CFG, st, pcm[k])
    path = str(tmp_path / "mid.npz")
    save_state(path, st)
    st2 = load_state(path, rx_init(CFG))
    outs_resumed = []
    for k in range(2, 4):
        st2, o = rx_frame(CFG, st2, pcm[k])
        outs_resumed.append(np.asarray(o.symbols.re))
    np.testing.assert_array_equal(outs_direct[2], outs_resumed[0])
    np.testing.assert_array_equal(outs_direct[3], outs_resumed[1])


def test_eager_assert_finite():
    eager_assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        eager_assert_finite({"a": jnp.asarray([1.0, np.nan])})


def test_checkify_assert_finite():
    from jax.experimental import checkify

    def fn(x):
        assert_finite(x, "x")
        return x * 2

    err, out = checkify.checkify(fn)(jnp.ones(4))
    err.throw()  # no error
    err, out = checkify.checkify(fn)(jnp.asarray([1.0, jnp.inf]))
    with pytest.raises(Exception):
        err.throw()


def test_scatter_tap_inside_jit():
    tap = ScatterTap()

    @jax.jit
    def fn(z):
        tap.tap(z)
        return z.re + z.im

    z = CF32(jnp.ones((2, 8)), jnp.zeros((2, 8)))
    fn(z).block_until_ready()
    pts = tap.as_array()
    assert pts.shape == (16, 2)
    np.testing.assert_allclose(pts[:, 0], 1.0)


def test_global_mesh_axes():
    mesh = multihost.global_mesh(("dp",))
    assert mesh.shape["dp"] == len(jax.devices())
    mesh2 = multihost.global_mesh(("dp", "sp"), (len(jax.devices()) // 2, 2))
    assert mesh2.shape["sp"] == 2


def test_aggregate_metrics_psum():
    mesh = multihost.global_mesh(("dp",))
    n = len(jax.devices())
    agg = multihost.aggregate_metrics(mesh, "dp")
    local = {"ber": jnp.arange(n, dtype=jnp.float32)}
    out = agg(local)
    np.testing.assert_allclose(np.asarray(out["ber"]),
                               np.arange(n).mean(), rtol=1e-6)


def test_initialize_noop_single_process():
    multihost.initialize()  # must not raise on a single-process run


def test_snr_estimate_m2m4():
    """M2M4 blind SNR estimator: within 0.5 dB of truth on synthetic QPSK
    + AWGN across the operating range, any amplitude scale."""
    from qpsk_tpu.metrics import snr_estimate_db

    rng = np.random.default_rng(0)
    n = 200_000
    for true_db in (5.0, 10.0, 15.0):
        s = 1.45 * np.exp(1j * (np.pi / 4 + np.pi / 2
                                * rng.integers(0, 4, n)))
        npow = 1.45**2 / 10 ** (true_db / 10)
        z = s + np.sqrt(npow / 2) * (rng.normal(size=n)
                                     + 1j * rng.normal(size=n))
        est = float(snr_estimate_db(CF32(
            jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32))))
        assert abs(est - true_db) < 0.5, (true_db, est)
