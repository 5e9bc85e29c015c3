"""Fused Costas-loop kernel (Pallas / Mosaic TPU).

The Costas recurrence (costas_loop.c:56-74 semantics, see ops/costas.py) is
the modem's serialization bottleneck: each symbol's derotation uses the
phase updated by the previous symbol.  ``lax.scan`` is correct but pays
XLA's per-step op overhead (~1.7 us/step measured on v5e at 1024 channels —
2048-symbol blocks cost ~3.4 ms).  This kernel runs the whole loop as ONE
Mosaic kernel: a ``fori_loop`` over symbols with the batch of channels on
the VPU lanes, state held in VMEM scratch, symbol blocks streamed by the
Pallas pipeline.

Layout: time-major ``(T, C)`` with channels on the minor (lane) axis, so
each step reads/writes one sublane row — contiguous lanes, no transposes
inside the loop.  The grid is ``(C // CT, T // TT)``; TPU grids execute
sequentially with the last axis fastest, so per-channel-tile state persists
in scratch across the T tiles (initialized at j == 0, flushed at the last
j).

Semantics are bit-identical to ``costas_run`` (same op order as the C
loop); tests assert exact agreement against the ``lax.scan`` version in
interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpsk_tpu.ops.costas import CostasParams, CostasState, TAU
from qpsk_tpu.ops.cplx import CF32


def _kernel(params_ref, zr_ref, zi_ref, phase0_ref, freq0_ref,
            or_ref, oi_ref, ft_ref, phase_out_ref, freq_out_ref,
            phase_s, freq_s):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tt = zr_ref.shape[0]

    alpha = params_ref[0]
    beta = params_ref[1]
    min_freq = params_ref[2]
    max_freq = params_ref[3]

    @pl.when(j == 0)
    def _():
        phase_s[:] = phase0_ref[:]
        freq_s[:] = freq0_ref[:]

    def step(t, carry):
        phase = phase_s[:]
        freq = freq_s[:]
        zr = zr_ref[pl.ds(t, 1), :]     # (1, CT) row
        zi = zi_ref[pl.ds(t, 1), :]
        # derotate by the *current* phase (qpsk.c:197)
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        outr = zr * c + zi * s          # z * e^{-j phase}
        outi = zi * c - zr * s
        or_ref[pl.ds(t, 1), :] = outr
        oi_ref[pl.ds(t, 1), :] = outi
        # decision-directed error (costas_loop.c:44-47)
        sr = jnp.where(outr > 0.0, 1.0, -1.0).astype(jnp.float32)
        si = jnp.where(outi > 0.0, 1.0, -1.0).astype(jnp.float32)
        err = sr * outi - si * outr
        # advance (costas_loop.c:56-59), wrap, clamp
        freq = freq + beta * err
        phase = (phase + freq) + alpha * err
        tau = jnp.float32(TAU)
        phase = jnp.where(phase > tau, phase - tau, phase)
        phase = jnp.where(phase > tau, phase - tau, phase)
        phase = jnp.where(phase < -tau, phase + tau, phase)
        phase = jnp.where(phase < -tau, phase + tau, phase)
        freq = jnp.clip(freq, min_freq, max_freq)
        ft_ref[pl.ds(t, 1), :] = freq    # post-update trace (qpsk.c:217)
        phase_s[:] = phase
        freq_s[:] = freq
        return carry

    # Mosaic supports only unroll=1 or full unroll for fori_loop
    jax.lax.fori_loop(0, tt, step, 0, unroll=1)

    @pl.when(j == nj - 1)
    def _():
        phase_out_ref[:] = phase_s[:]
        freq_out_ref[:] = freq_s[:]


@functools.partial(jax.jit, static_argnames=("ct", "tt", "interpret"))
def _costas_pallas_tc(zr, zi, phase0, freq0, params_vec,
                      ct: int, tt: int, interpret: bool = False):
    """Time-major kernel launch: zr/zi are (T, C)."""
    t, c = zr.shape
    grid = (c // ct, t // tt)

    state_spec = pl.BlockSpec((1, ct), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    block_spec = pl.BlockSpec((tt, ct), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((t, c), jnp.float32),   # out re
        jax.ShapeDtypeStruct((t, c), jnp.float32),   # out im
        jax.ShapeDtypeStruct((t, c), jnp.float32),   # freq trace
        jax.ShapeDtypeStruct((1, c), jnp.float32),   # final phase
        jax.ShapeDtypeStruct((1, c), jnp.float32),   # final freq
    )
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # params (4,)
            block_spec, block_spec,                   # z planes
            state_spec, state_spec,                   # initial phase/freq
        ],
        out_specs=(block_spec, block_spec, block_spec, state_spec, state_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, ct), jnp.float32),
            pltpu.VMEM((1, ct), jnp.float32),
        ],
        interpret=interpret,
    )(params_vec, zr, zi, phase0[None, :], freq0[None, :])


def _pick_tiles(c: int, t: int):
    # widest channel tile wins: the per-step cost is loop/VMEM-issue
    # overhead, not VPU compute, so it amortizes across lanes (measured on
    # v5e: ct 512→2048 cut us/step from 1.67 to 1.44; the channel-tile grid
    # axis is OUTER-sequential, so channels beyond ct multiply wall time
    # linearly — keep ct as wide as VMEM allows)
    ct = 128
    while ct * 2 <= min(c, 8192) and c % (ct * 2) == 0:
        ct *= 2
    tt = t
    # stream T in tiles that keep the VMEM working set modest (~4 buffers
    # of (tt, ct) f32 for in/out planes, double-buffered by the pipeline)
    max_tt = max(8, (2 * 1024 * 1024) // (ct * 4 * 4))
    while tt > max_tt and tt % 2 == 0:
        tt //= 2
    return ct, tt


def costas_run_pallas(state: CostasState, symbols: CF32,
                      params: CostasParams, interpret: bool = False):
    """Drop-in replacement for ``costas_run`` on (C, T) symbol batches.

    Requires C a multiple of 128 (lane width).  Returns the same
    (new_state, derotated) pair; trajectories match the scan bit-for-bit.
    """
    st, out, _ = costas_run_pallas_traced(state, symbols, params,
                                          interpret=interpret)
    return st, out


def costas_run_pallas_traced(state: CostasState, symbols: CF32,
                             params: CostasParams, interpret: bool = False):
    """Pallas twin of ``costas_run_traced``: also returns the per-symbol
    post-update frequency trace (rad/symbol)."""
    c, t = symbols.re.shape
    assert c % 128 == 0, f"channel count {c} must be a multiple of 128"
    ct, tt = _pick_tiles(c, t)
    params_vec = jnp.stack([params.alpha, params.beta,
                            params.min_freq, params.max_freq])
    zr = symbols.re.T
    zi = symbols.im.T
    outr, outi, ftrace, phase, freq = _costas_pallas_tc(
        zr, zi, state.phase, state.freq, params_vec, ct=ct, tt=tt,
        interpret=interpret)
    return (CostasState(phase=phase[0], freq=freq[0]),
            CF32(outr.T, outi.T), ftrace.T)
