"""AWGN calibration sanity: measured BER vs QPSK theory.

For Gray-coded QPSK, BER = Q(sqrt(2 Eb/N0)).  With the channel's SNR
defined over the full passband (real noise of power P_sig/SNR across
fs/2), Eb/N0 = SNR_lin * fs / (4 * rs) — at fs/rs = 4 samples/symbol,
Eb/N0 equals SNR_lin.  The demod chain (timing, Costas phase noise, sync)
costs some implementation margin, so the test brackets: measured BER must
exceed the theoretical floor and stay within an order of magnitude of it.
"""

import math

import numpy as np
from scipy.stats import norm  # available via scipy (jax dependency)
import pytest

from qpsk_tpu import ModemConfig
from qpsk_tpu.eval import per_vs_snr
from qpsk_tpu.packet import PacketConfig


def qfunc(x):
    return float(norm.sf(x))


def test_ber_within_implementation_margin_of_theory():
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    snr_db = 7.0
    res = per_vs_snr(cfg, pcfg, [snr_db], nframes=200, seed=3)[0]
    assert res["sync_score"] >= 3
    ebn0 = 10 ** (snr_db / 10.0)  # see module docstring
    ber_theory = qfunc(math.sqrt(2 * ebn0))
    measured = res["ber"]
    # floor: can't beat theory (beyond statistical noise); ceiling: within
    # ~10x implementation loss
    assert measured >= ber_theory / 3, (measured, ber_theory)
    assert measured <= ber_theory * 10, (measured, ber_theory)
