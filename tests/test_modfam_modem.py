"""End-to-end modem integration for the generic modulation family:
bits -> TX @ carrier offset -> [AWGN] -> rx_stream (generic DD carrier
recovery) -> slice, asserting lock, EVM, and bit recovery under the
family's rotation ambiguity (resolved by lag/rotation search here; the
CRC-scored sync hunt is exercised in test_modfam_packets.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import rx_acquire_hz, rx_stream, tx_stream
from qpsk_tpu.ops import modfam
from qpsk_tpu.ops.acquire import hz_to_costas_freq
from qpsk_tpu.ops.cplx import CF32

NFRAMES = 32
SKIP = 10  # loop-convergence transient, frames


def _cfg(name):
    return ModemConfig(modulation=name, agc=(name == "16qam"))


def _run(name, snr_db, offset_hz, seed=0):
    cfg = _cfg(name)
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(
        0, 2, (NFRAMES, cfg.bits_per_frame), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), bits, tx_offset_hz=offset_hz)
    if snr_db is not None:
        sp = float(jnp.mean((pcm.astype(jnp.float32) / cfg.pcm_scale) ** 2))
        pcm = awgn_pcm(jax.random.key(seed), pcm, snr_db=snr_db,
                       signal_power=sp)
    est = rx_acquire_hz(cfg, pcm)
    state = rx_init(cfg, acq_freq=hz_to_costas_freq(est, cfg.rs))
    _, out = jax.jit(lambda s, x: rx_stream(cfg, s, x))(state, pcm)
    return cfg, bits, out


def _best_match(cfg, bits, out):
    """Search rotation x symbol lag for the best post-transient bit match;
    returns the match fraction."""
    mod = modfam.get(cfg.modulation)
    got = np.asarray(out.bits).ravel()
    want = np.asarray(bits).ravel()
    skip = SKIP * cfg.bits_per_frame
    n = 16 * cfg.bits_per_frame
    best = 0.0
    for r in range(mod.n_rot):
        rb = np.asarray(modfam.rotate_bits_mod(jnp.asarray(got), r, mod))
        for lag_sym in range(0, 3 * cfg.symbols_per_frame):
            lag = skip - lag_sym * mod.bps
            if lag < 0:
                continue
            frac = float(np.mean(rb[skip:skip + n]
                                 == want[lag:lag + n]))
            best = max(best, frac)
    return best


@pytest.mark.parametrize("name", ["bpsk", "8psk", "16qam"])
def test_loopback_clean(name):
    """Noiseless + 20 Hz offset: lock, tight EVM, error-free bits."""
    cfg, bits, out = _run(name, None, 20.0)
    assert abs(float(jnp.mean(out.freq_hz[-8:])) - 20.0) < 3.0
    mod = modfam.get(name)
    tail = CF32(out.symbols.re[SKIP:].ravel(), out.symbols.im[SKIP:].ravel())
    assert float(modfam.evm_mod(tail, mod)) < 0.1
    assert _best_match(cfg, bits, out) == 1.0


@pytest.mark.parametrize("name,snr", [("bpsk", 8.0), ("8psk", 18.0),
                                      ("16qam", 20.0)])
def test_loopback_awgn(name, snr):
    """Operating-SNR AWGN + 20 Hz offset: lock and near-error-free bits."""
    cfg, bits, out = _run(name, snr, 20.0)
    assert abs(float(jnp.mean(out.freq_hz[-8:])) - 20.0) < 6.0
    assert _best_match(cfg, bits, out) > 0.995


def test_16qam_decisions_need_the_agc_scale():
    """16QAM slicing is amplitude-true: the same link with agc disabled
    still works only because the calibrated chain magnitude matches
    agc_target — a mis-leveled input (-6 dB) breaks the uncoded decisions
    unless the AGC renormalizes it."""
    name = "16qam"
    cfg = ModemConfig(modulation=name, agc=True)
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(
        0, 2, (NFRAMES, cfg.bits_per_frame), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), bits)
    pcm = (np.asarray(pcm).astype(np.float32) * 0.5).astype(np.int16)
    _, out = rx_stream(cfg, rx_init(cfg), jnp.asarray(pcm))
    assert _best_match(cfg, bits, out) == 1.0

    cfg_noagc = ModemConfig(modulation=name, agc=False)
    _, out2 = rx_stream(cfg_noagc, rx_init(cfg_noagc), jnp.asarray(pcm))
    assert _best_match(cfg_noagc, bits, out2) < 0.9
