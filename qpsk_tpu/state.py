"""Explicit modem state pytrees.

The reference keeps every piece of cross-frame state in file-scope globals:
filter delay lines (qpsk.c:36-37), NCO phasors (qpsk.c:45-51), Costas loop
(costas_loop.c:13-23), the decimator's one-frame delay (qpsk.c:182-191) and
scrambler registers (bit-scramble.c:41-42).  Here all of it is one pytree
threaded functionally through pure ``(state, block) -> (state', out)``
functions, which makes vmap-per-channel, pjit sharding, and checkpoint/resume
(qpsk_tpu/utils/checkpoint.py) trivial.
"""

from __future__ import annotations

from typing import Any, NamedTuple

from qpsk_tpu.config import ModemConfig
from qpsk_tpu.ops.costas import CostasState, costas_init
from qpsk_tpu.ops.cplx import CF32, czeros
from qpsk_tpu.ops.nco import nco_init
from qpsk_tpu.ops.rrc import fir_init_tail


class TxState(NamedTuple):
    fir_tail: CF32    # (..., ntaps-1) (qpsk.c:36)
    nco_phase: CF32   # (...,) unit phasor (qpsk.c:45)
    # differential-mode accumulator (ops/differential.py); None when
    # cfg.differential is off (None leaves vanish from the pytree)
    diff_phase: Any = None   # (...,) int32 absolute phase index


class RxState(NamedTuple):
    fir_tail: CF32     # (..., ntaps-1) (qpsk.c:37)
    nco_phase: CF32    # (...,) unit phasor (qpsk.c:48)
    costas: CostasState  # (...,) phase/freq (costas_loop.c:13-15)
    decim_delay: CF32  # (..., nsym) previous frame picks (qpsk.c:186-191)
    diff_prev: Any = None    # (...,) CF32 previous symbol (differential mode)
    timing: Any = None       # (tau, dtau) float32 pair (timing_mode="tracking")
    eq: Any = None           # (w, hist) CMA equalizer taps (cfg.eq_taps > 0)
    agc: Any = None          # (...,) smoothed symbol RMS (cfg.agc)


def tx_init(cfg: ModemConfig, batch_shape=()) -> TxState:
    from qpsk_tpu.ops.differential import diff_tx_init
    return TxState(
        fir_tail=fir_init_tail(cfg.ntaps, batch_shape),
        nco_phase=nco_init(batch_shape),
        diff_phase=diff_tx_init(batch_shape) if cfg.differential else None)


def rx_init(cfg: ModemConfig, batch_shape=(), acq_freq=0.0) -> RxState:
    from qpsk_tpu.ops.agc import agc_init
    from qpsk_tpu.ops.differential import diff_rx_init
    from qpsk_tpu.ops.equalizer import eq_init
    from qpsk_tpu.ops.timing import timing_track_init
    return RxState(
        fir_tail=fir_init_tail(cfg.ntaps, batch_shape),
        nco_phase=nco_init(batch_shape),
        costas=costas_init(batch_shape, freq=acq_freq,
                           gear=cfg.loop_bw_track > 0),
        decim_delay=czeros(batch_shape + (cfg.symbols_per_frame,)),
        diff_prev=diff_rx_init(batch_shape) if cfg.differential else None,
        timing=(timing_track_init(batch_shape)
                if cfg.timing_mode == "tracking" else None),
        eq=(eq_init(cfg.eq_taps, batch_shape) if cfg.eq_taps > 0 else None),
        agc=agc_init(batch_shape) if cfg.agc else None)
