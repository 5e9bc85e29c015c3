"""PER/BER vs SNR sweep harness tests (BASELINE config #3)."""

import numpy as np

from qpsk_tpu import ModemConfig
from qpsk_tpu.eval import per_vs_snr
from qpsk_tpu.packet import PacketConfig


def test_per_vs_snr_monotone():
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    res = per_vs_snr(cfg, pcfg, snr_db=[0.0, 6.0, 12.0], nframes=60, seed=0)
    assert [r["snr_db"] for r in res] == [0.0, 6.0, 12.0]
    # high SNR decodes cleanly
    assert res[2]["sync_score"] == 4
    assert res[2]["per"] == 0.0
    assert res[2]["ber"] == 0.0
    # EVM improves with SNR
    evms = [r["evm_rms"] for r in res]
    assert evms[0] > evms[1] > evms[2]
    # PER degrades as SNR drops (0 dB may or may not sync at all)
    assert res[0]["per"] >= res[2]["per"]


def test_per_vs_snr_mid_snr_partial():
    """Around the waterfall region some packets fail CRC but every
    CRC-passing packet must be bit-exact (no silent corruption)."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    res = per_vs_snr(cfg, pcfg, snr_db=[10.0], nframes=80, seed=1)[0]
    assert res["sync_score"] >= 3
    assert res["per"] < 0.2
    # ber should be small but may be nonzero at 10 dB
    assert res["ber"] < 0.02
