"""Golden-vector parity vs the compiled C reference.

``tests/golden/reference_vectors.npz`` holds stage-by-stage dumps from the
reference modem driven with deterministic bits (tools/golden_gen.c): RRC
impulse response, TX PCM, RX matched-filter output, decimated symbols,
Costas-derotated symbols, and the detected-frequency trajectory.

Tolerances are set by measured mechanisms, not hand-waving:

* impulse / Costas-given-identical-input: ~1e-6 (same float32 math).
* waveforms: the reference's free-running NCOs accumulate one ulp of
  libm ``cosf`` rounding per sample and are renormalized in magnitude but
  not in angle (qpsk.c:120,253) — so even two C builds against different
  libms drift apart linearly.  Measured drift here: ≤1 PCM count on frame
  0 growing to ~21 counts (0.13% FS) by frame 19; the RX front-end tracks
  within 3e-4.
* the last 1-2 decimated symbols per frame are excluded: with timing
  index > 3 the C decimator reads past ``input_frame`` (qpsk.c:188-189,
  undefined behavior) — a reference bug we clamp instead of replicating.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qpsk_tpu import config_parity, rx_init, tx_init
from qpsk_tpu.modem import _tmat_for, rx_stream, taps_for, tx_bits_frame
from qpsk_tpu.ops import costas as costas_ops
from qpsk_tpu.ops import nco, rrc as rrc_ops
from qpsk_tpu.ops.cplx import CF32

GOLDEN = np.load("tests/golden/reference_vectors.npz")
CFG = config_parity()


def test_rrc_impulse_response():
    imp = np.zeros(2 * CFG.ntaps, np.float32)
    imp[0] = 1.0
    tmat = rrc_ops.toeplitz_taps(taps_for(CFG), 2 * CFG.ntaps)
    y, _ = rrc_ops.fir_block(
        CF32(jnp.asarray(imp), jnp.zeros(2 * CFG.ntaps, jnp.float32)),
        rrc_ops.fir_init_tail(CFG.ntaps), jnp.asarray(tmat), CFG.gain,
        2 * CFG.ntaps)
    np.testing.assert_allclose(np.asarray(y.re), GOLDEN["impulse"][:, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y.im), GOLDEN["impulse"][:, 1],
                               atol=1e-6)


def test_tx_pcm_parity():
    bits = jnp.asarray(GOLDEN["bits"])
    st = tx_init(CFG)
    pcms = []
    for k in range(bits.shape[0]):
        st, p = tx_bits_frame(CFG, st, bits[k], tx_offset_hz=50.0)
        pcms.append(np.asarray(p))
    pcm = np.stack(pcms).astype(np.int32)
    ref = GOLDEN["pcm"].astype(np.int32)
    d = np.abs(pcm - ref)
    assert d[0].max() <= 2, d[0].max()      # first frame: rounding only
    assert d.max() <= 32, d.max()           # ulp NCO drift bound (see module doc)


def _rx_frontend():
    """Frame-by-frame mix-down + matched filter in exact parity order."""
    pcm = GOLDEN["pcm"].reshape(-1)
    x = CF32(jnp.asarray(pcm.astype(np.float32) / 16384.0),
             jnp.zeros(pcm.size, jnp.float32))
    ph = nco.nco_init()
    tail = rrc_ops.fir_init_tail(CFG.ntaps)
    tmat = jnp.asarray(_tmat_for(CFG, 512))
    out = []
    for k in range(40):
        seg = CF32(x.re[k * 512:(k + 1) * 512], x.im[k * 512:(k + 1) * 512])
        seg, ph = nco.mix(seg, ph, -CFG.omega_center, "exact")
        seg, tail = rrc_ops.fir_block(seg, tail, tmat, CFG.gain, 512)
        out.append(np.stack([np.asarray(seg.re), np.asarray(seg.im)], -1))
    return np.stack(out)


def test_rx_frontend_parity():
    filt = _rx_frontend()
    np.testing.assert_allclose(filt, GOLDEN["filt"], atol=1e-3)


def test_rx_decimation_parity():
    """Full RX in parity mode: the decimated symbols delivered to the
    Costas loop match the C globals (excluding the UB last picks)."""
    state = rx_init(CFG)
    _, out = rx_stream(CFG, state, jnp.asarray(GOLDEN["pcm"].reshape(40, 512)))
    filt = _rx_frontend()
    ti = np.asarray(out.timing_index)
    prev = np.zeros((128, 2), np.float32)
    mine = []
    for k in range(40):
        pos = np.clip(np.arange(128) * 4 + int(ti[k]), 0, 511)
        mine.append(prev)
        prev = filt[k][pos]
    mine = np.stack(mine)
    np.testing.assert_allclose(mine[:, :126], GOLDEN["decim"][:, :126],
                               atol=1e-3)


def test_costas_parity_isolated():
    """Costas recurrence on the reference's own decimated input: the scan
    reproduces the C trajectory to float32 noise."""
    params = costas_ops.costas_params(CFG.loop_bw, CFG.damping,
                                      CFG.min_freq, CFG.max_freq)
    st = costas_ops.costas_init(())
    dec = GOLDEN["decim"]
    mine = []
    for k in range(dec.shape[0]):
        st, sym = costas_ops.costas_run(
            st, CF32(jnp.asarray(dec[k, :, 0]), jnp.asarray(dec[k, :, 1])),
            params)
        mine.append(np.stack([np.asarray(sym.re), np.asarray(sym.im)], -1))
    np.testing.assert_allclose(np.stack(mine), GOLDEN["costas"], atol=1e-5)


def test_freq_lock_parity():
    """Both implementations detect the +50 Hz stimulus."""
    state = rx_init(CFG)
    _, out = rx_stream(CFG, state, jnp.asarray(GOLDEN["pcm"].reshape(40, 512)))
    mine = float(np.mean(np.asarray(out.freq_hz)[-10:]))
    ref = float(GOLDEN["freq"][-10:, 0].mean())
    # the C trajectory carries its per-frame UB symbol (module doc), so the
    # loops wander a few Hz apart around the same lock point
    assert abs(mine - ref) < 5.0, (mine, ref)
    assert abs(mine - 50.0) < 3.0, mine
    assert abs(ref - 50.0) < 3.0, ref
