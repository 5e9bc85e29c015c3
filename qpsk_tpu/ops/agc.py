"""Automatic gain control (frame-rate), on the decimated symbol stream.

Capability extension — the reference assumes its own fixed TX scaling: RX
divides by the exact int16 full-scale the TX multiplied by (qpsk.c:113,
qpsk.c:260), so a real link with unknown audio levels breaks two
amplitude-sensitive stages:

* the Costas loop's decision-directed error ``sign(Re)·Im − sign(Im)·Re``
  (costas_loop.c:44-47) scales linearly with symbol amplitude, so the
  effective loop bandwidth scales with input level — 20 dB low and the
  hand-tuned alpha/beta (README.md:12) are 10x too slow to pull in;
  20 dB hot and the loop over-corrects into instability;
* the CMA equalizer's constant-modulus target R (ops/equalizer.py) is an
  absolute amplitude.

Design, TPU-first (the same shape as the frame-rate timing PLL and the
block-CMA equalizer): a per-frame RMS measurement over the decimated
symbols (nsym-wide, fully batched VPU work) drives a one-pole gain
estimate carried across frames/chunks; each frame is scaled by
``target / rms_est``.  The sequential chain is nframes long (one `lax.scan`
already paid for by the equalizer path), not nsamples.  Timing estimation,
FFT acquisition and the CRC sync are scale-invariant, so the AGC sits
where the amplitude first matters: after decimation, before the
equalizer / Costas loop.

State is a single (...,) float32 smoothed-RMS estimate; 0 means "unset"
(the first frame seeds it with its own measurement — instant coarse
acquisition, then ``mu``-smoothed tracking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qpsk_tpu.ops.cplx import CF32


def agc_init(batch_shape=()) -> jnp.ndarray:
    """Carried smoothed symbol-RMS estimate; 0 = unset (seeded by the first
    frame's own measurement)."""
    return jnp.zeros(batch_shape, jnp.float32)


def agc_frame(rms_est: jnp.ndarray, frame: CF32, target: float, mu: float):
    """Scale one (..., nsym) frame of symbols to the target RMS.

    Returns (new_rms_est, scaled_frame).  The frame is scaled by the
    *updated* estimate (feedforward with smoothing): the first frame after
    cold start is already corrected by its own measurement rather than
    passing through at the wrong level.
    """
    p = jnp.mean(frame.re * frame.re + frame.im * frame.im, axis=-1)
    rms = jnp.sqrt(p + 1e-12)
    est = jnp.where(rms_est > 0.0,
                    rms_est + jnp.float32(mu) * (rms - rms_est),
                    rms)
    g = jnp.float32(target) / jnp.maximum(est, 1e-6)
    gx = g[..., None]
    return est, CF32(frame.re * gx, frame.im * gx)


def agc_stream(rms_est: jnp.ndarray, frames: CF32, target: float, mu: float):
    """Run the frame-rate AGC over (..., nframes, nsym) symbols.

    The per-symbol math is batched; only the scalar gain estimate scans
    over the frame axis.  Returns (new_rms_est, scaled (..., nframes, nsym)).
    """

    def step(est, fr):
        est, y = agc_frame(est, CF32(*fr), target, mu)
        return est, (y.re, y.im)

    xs = (jnp.moveaxis(frames.re, -2, 0), jnp.moveaxis(frames.im, -2, 0))
    rms_est, (yr, yi) = jax.lax.scan(step, rms_est, xs)
    return rms_est, CF32(jnp.moveaxis(yr, 0, -2), jnp.moveaxis(yi, 0, -2))
