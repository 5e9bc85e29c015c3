"""Overlap-save RRC FIR kernel (Pallas / Mosaic TPU).

The XLA lowering of the block FIR (ops/rrc.py) is a Toeplitz matmul over
materialized window tensors: for each output tile it writes a
``(..., block + ntaps - 1)`` window to HBM, then reads it back into the
MXU — ~4x the fundamental memory traffic.  This kernel forms the window in
VMEM instead: the grid walks (channel tiles x output blocks), each step
loads two aligned ``(CT, B)`` views of the tail-extended input (the block
itself and the halo run-in of the next), concatenates them on-chip, and
issues one ``(CT, B + halo) @ (B + halo, B)`` MXU matmul per I/Q plane.
GAIN (rrc_fir.c:28's per-output multiply) is fused.

The 127-tap filter's natural halo is 126; the kernel pads it to a
lane-aligned 128 with two zero taps in front (mathematically identical —
the padded taps multiply two extra history samples by zero), so every
VMEM concat/slice lands on 128-lane boundaries.

Numerics: float32 HIGHEST-precision matmuls, same contraction order as the
XLA path; tests assert agreement to float32 round-off.

Measured on v5e (1024 ch x 8192 samples): 2.3 ms vs the XLA Toeplitz
matmul's 1.85 ms — XLA's fusion pipeline wins for this op today, so the
default path stays XLA (ops/rrc.fir_block); this kernel is kept as the
substrate for a future fused mix+FIR+timing front-end where the win comes
from eliminating inter-stage HBM round trips, not from the matmul itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpsk_tpu.ops.cplx import CF32

_HALO = 128


def _kernel(tmat_ref, ar_ref, ai_ref, br_ref, bi_ref, or_ref, oi_ref,
            *, gain: float):
    b = ar_ref.shape[1]
    g = jnp.float32(gain)
    wr = jnp.concatenate([ar_ref[:, :], br_ref[:, b - _HALO:]], axis=1)
    wi = jnp.concatenate([ai_ref[:, :], bi_ref[:, b - _HALO:]], axis=1)
    or_ref[:, :] = jnp.dot(wr, tmat_ref[:, :],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) * g
    oi_ref[:, :] = jnp.dot(wi, tmat_ref[:, :],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) * g


@functools.lru_cache(maxsize=None)
def _padded_tmat(taps_key: tuple, block: int) -> np.ndarray:
    """(block + 128, block) Toeplitz with taps front-padded by zeros to a
    128 halo: T[p + k, col=p] covers window sample p + k, taps' index k."""
    from qpsk_tpu.ops.rrc import toeplitz_taps
    taps = np.asarray(taps_key, np.float32)
    pad = _HALO - (taps.shape[0] - 1)
    assert pad >= 0, "ntaps too large for 128 halo"
    taps_p = np.concatenate([np.zeros(pad, np.float32), taps])
    return toeplitz_taps(taps_p, block)


@functools.partial(jax.jit,
                   static_argnames=("block", "ct", "gain", "interpret"))
def _fir_pallas_2d(ext_re, ext_im, tmat, block: int, ct: int, gain: float,
                   interpret: bool = False):
    """ext_*: (C, n + 128) tail-extended planes; returns (C, n) planes."""
    c, n_ext = ext_re.shape
    n = n_ext - _HALO
    grid = (c // ct, n // block)

    # two aligned, non-overlapping views: window_j = [a_j ; b_j[:, -128:]]
    a_re, a_im = ext_re[:, :n], ext_im[:, :n]
    b_re, b_im = ext_re[:, _HALO:], ext_im[:, _HALO:]

    blk = pl.BlockSpec((ct, block), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((block + _HALO, block), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((c, n), jnp.float32),
                 jax.ShapeDtypeStruct((c, n), jnp.float32))
    kern = functools.partial(_kernel, gain=gain)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[tspec, blk, blk, blk, blk],
        out_specs=(blk, blk),
        out_shape=out_shape,
        interpret=interpret,
    )(tmat, a_re, a_im, b_re, b_im)


def fir_block_pallas(x: CF32, taps: np.ndarray, tail: CF32, gain: float,
                     block: int = 512, interpret: bool = False):
    """Drop-in replacement for ops.rrc.fir_block on (C, n) batches.

    Args mirror fir_block except the raw ``taps`` are passed (the kernel
    builds its own 128-halo Toeplitz).  C must be a multiple of 8.
    Returns (y, new_tail) with the same (ntaps - 1)-sample tail carry.
    """
    c, n = x.shape
    assert n % block == 0, (n, block)
    ntaps_m1 = tail.shape[-1]
    tmat = jnp.asarray(_padded_tmat(tuple(np.asarray(taps).tolist()), block))
    ct = 8
    while ct * 2 <= min(c, 256) and c % (ct * 2) == 0:
        ct *= 2
    pad = _HALO - ntaps_m1
    zeros = jnp.zeros(x.shape[:-1] + (pad,), jnp.float32)
    ext_re = jnp.concatenate([zeros, tail.re, x.re], axis=-1)
    ext_im = jnp.concatenate([zeros, tail.im, x.im], axis=-1)
    yr, yi = _fir_pallas_2d(ext_re, ext_im, tmat, block=block, ct=ct,
                            gain=float(gain), interpret=interpret)
    new_tail = CF32(ext_re[..., n + pad:], ext_im[..., n + pad:])
    return CF32(yr, yi), new_tail
