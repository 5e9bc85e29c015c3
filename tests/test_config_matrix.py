"""Configuration-matrix smoke: every supported option combination either
raises a clean ValueError at construction (the validation contract) or
runs TX -> RX -> slice end-to-end without error and with finite outputs.

This is the hole-finder for silent-degradation bugs: a combination that
crashes deep inside a lowering, or produces NaN symbols, fails here —
the mode interactions (modulation x agc x eq x timing x fec x
differential x gear) are exactly where round-N features meet round-M
features for the first time.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.config import TAU
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet

MODS = ["qpsk", "bpsk", "8psk", "16qam"]
FLAGS = [  # (differential, agc, eq_taps, timing, loop_bw_track)
    (False, False, 0, "power", 0.0),
    (True, False, 0, "power", 0.0),
    (False, True, 0, "power", 0.0),
    (False, False, 5, "power", 0.0),
    (False, False, 0, "tracking", 0.0),
    (False, False, 0, "fractional", 0.0),
    (False, False, 0, "histogram", 0.0),
    (False, False, 0, "power", TAU / 200.0),
    (False, True, 5, "tracking", 0.0),
]


def _combo_id(p):
    mod, (diff, agc, eq, timing, trk) = p
    return (f"{mod}-d{int(diff)}-a{int(agc)}-e{eq}-{timing}-"
            f"g{int(trk > 0)}")


@pytest.mark.parametrize(
    "mod,flags", list(itertools.product(MODS, FLAGS)),
    ids=[_combo_id(p) for p in itertools.product(MODS, FLAGS)])
def test_config_combo_runs_or_rejects(mod, flags):
    diff, agc, eq, timing, trk = flags
    try:
        cfg = ModemConfig(modulation=mod, differential=diff, agc=agc,
                          eq_taps=eq, timing_mode=timing,
                          loop_bw_track=trk)
    except ValueError:
        # the validation contract: unsupported combinations are rejected
        # loudly at CONSTRUCTION, never deep inside a lowering
        assert mod != "qpsk" and (diff or trk > 0), (mod, flags)
        return
    rng = np.random.default_rng(0)
    nframes = 3
    bits = jnp.asarray(rng.integers(
        0, 2, (nframes, cfg.bits_per_frame), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), bits, tx_offset_hz=30.0)
    assert np.isfinite(np.asarray(pcm, np.float32)).all()
    _, out = rx_stream(cfg, rx_init(cfg), pcm.reshape(nframes, -1))
    sym = np.asarray(out.symbols.re)
    assert np.isfinite(sym).all(), (mod, flags)
    b = np.asarray(out.bits)
    assert b.shape[-1] == cfg.bits_per_frame and ((b == 0) | (b == 1)).all()
    assert np.isfinite(np.asarray(out.freq_hz)).all()


@pytest.mark.parametrize("fec", [False, "conv", "ldpc"])
@pytest.mark.parametrize("mod", MODS)
def test_packet_combo_assembles_and_decodes_shape(mod, fec):
    """Every (modulation, FEC) pair assembles and soft/hard-disassembles
    with consistent shapes (decode QUALITY is the sweep artifacts' job;
    this pins that no pair is silently unsupported)."""
    from qpsk_tpu.packet.frame import (disassemble_packet,
                                       disassemble_packet_soft)

    cfg = ModemConfig(modulation=mod)
    pcfg = PacketConfig(payload_bytes=30, fec=fec)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, (2, 240), dtype=np.int32))
    chan = assemble_packet(pcfg, payload)
    assert chan.shape == (2, pcfg.frame_bits)
    rx = disassemble_packet(pcfg, chan)
    np.testing.assert_array_equal(np.asarray(rx.payload_bits),
                                  np.asarray(payload))
    assert np.asarray(rx.crc_ok).all()
    llrs = jnp.where(chan > 0, -4.0, 4.0).astype(jnp.float32)
    rxs = disassemble_packet_soft(pcfg, llrs)
    np.testing.assert_array_equal(np.asarray(rxs.payload_bits),
                                  np.asarray(payload))
    assert np.asarray(rxs.crc_ok).all()
