"""Fused Viterbi kernels (Pallas / Mosaic TPU).

The soft-decision Viterbi decoder (packet/fec.py) is the dominant
per-channel cost of a coded link: the XLA ``lax.scan`` lowering
materializes every ACS intermediate to HBM, so the forward pass runs
HBM-bound at ~18 us per trellis step (measured v5e, 4096-packet batch,
64 states) — ~12 full-array round trips per step.  These kernels keep the
path metrics (and the traceback's one-hot state) in VMEM scratch and
touch HBM only for the LLR input, the decision bits, and the decoded
output.

Layout: **batch on the lanes, the 64 states on the sublanes** — a
(64, BT) plane per quantity.  The ACS butterfly needs no gather and no
matmul (CLAUDE.md: lane gathers are ~10x; MXU would truncate the path
metrics to bf16): ``pred(s', p) = p*32 + (s' >> 1)``, so the predecessor
grid is each half of pm with every row repeated twice — a sublane-axis
reshape+broadcast.  The traceback's state hop is the dual fold
(``oh.reshape(32, 2, BT).sum(1)`` pairs successors) steered by the
batch-wide winner row, all VPU.

Numerics: identical op order to the scan twin (packet/fec.py), so
hard-LLR decodes (exact +-0.5 arithmetic) match bit-for-bit and
continuous-LLR decodes match except on exact candidate ties.  Time is
padded to the tile grid with zero-LLR steps that are *skipped* inside the
kernels (a zero-LLR trellis step would still diffuse metrics across
states and corrupt the decode — the padding must be inert, not neutral).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _fwd_kernel(sgn_ref, ll_ref, d_ref, pm_s, *, tt: int, rd: int,
                s_count: int, t_real: int):
    # sgn_ref: (S, 2*rd) static sign table, column q*2 + p = output q's
    # branch sign toward predecessor choice p
    j = pl.program_id(1)
    bt = ll_ref.shape[1]

    @pl.when(j == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (s_count, bt), 0)
        pm_s[:, :] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    # dynamic sublane offsets must be 8-aligned (vreg granularity): load
    # LLRs in 8-row groups (= 8//rd trellis steps) and index within the
    # group statically
    spg = 8 // rd

    def group(tg, carry):
        grp = ll_ref[pl.ds(tg * 8, 8), :]               # (8, BT)
        for ki in range(spg):
            t = tg * spg + ki
            t_abs = j * tt + t

            @pl.when(t_abs < t_real)
            def _(ki=ki, t=t):
                pm = pm_s[:, :]
                # predecessor metrics: halves of pm, rows repeated twice
                half0 = pm[0:s_count // 2, :]
                half1 = pm[s_count // 2:, :]
                pv0 = jnp.repeat(half0, 2, axis=0)      # (S, BT)
                pv1 = jnp.repeat(half1, 2, axis=0)
                # branch metrics: static (S, 1) sign columns x (1, BT)
                # LLR rows
                bm0 = 0.5 * sum(
                    sgn_ref[:, 2 * q:2 * q + 1]
                    * grp[ki * rd + q:ki * rd + q + 1, :]
                    for q in range(rd))
                bm1 = 0.5 * sum(
                    sgn_ref[:, 2 * q + 1:2 * q + 2]
                    * grp[ki * rd + q:ki * rd + q + 1, :]
                    for q in range(rd))
                c0 = pv0 + bm0
                c1 = pv1 + bm1
                d_ref[pl.ds(t * s_count, s_count), :] = (c1 > c0).astype(
                    jnp.bfloat16)   # 0/1 exact; halves the HBM round trip
                pm = jnp.maximum(c0, c1)
                pm_s[:, :] = pm - jnp.max(pm, axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, tt // spg, group, 0, unroll=1)


def _bwd_kernel(d_ref, b_ref, oh_s, u_s, *, tt: int, s_count: int,
                t_real: int, nj: int):
    j = pl.program_id(1)          # grid order; absolute tile = nj - 1 - j
    bt = d_ref.shape[1]
    jt = nj - 1 - j
    odd = jax.lax.broadcasted_iota(jnp.int32, (s_count, bt), 0) % 2

    # bit rows stage through an (8, BT) scratch so the output store is an
    # 8-aligned dynamic slice (single-row dynamic stores won't lower)
    def group(gi, carry):
        g = (tt // 8 - 1) - gi    # groups descend through the tile
        for kj in range(7, -1, -1):
            t = g * 8 + kj
            t_abs = jt * tt + t

            @pl.when(t_abs == t_real - 1)
            def _():
                # traceback starts at state 0 (tail-terminated encoder)
                row = jax.lax.broadcasted_iota(jnp.int32, (s_count, bt), 0)
                oh_s[:, :] = jnp.where(row == 0, 1.0, 0.0).astype(
                    jnp.float32)

            @pl.when(t_abs < t_real)
            def _(kj=kj, t=t):
                oh = oh_s[:, :]
                d = d_ref[pl.ds(t * s_count, s_count), :].astype(
                    jnp.float32)
                # the consumed input bit is the state's LSB; the winning
                # predecessor choice is this state's decision row
                u_s[kj:kj + 1, :] = jnp.sum(
                    jnp.where(odd == 1, oh, 0.0), axis=0, keepdims=True)
                won = jnp.sum(oh * d, axis=0, keepdims=True)
                # hop: successor pairs (2q, 2q+1) fold to predecessor q,
                # the winner steering which half the predecessor sits in
                fold = jnp.sum(oh.reshape(s_count // 2, 2, bt), axis=1)
                oh_s[:, :] = jnp.concatenate(
                    [fold * (1.0 - won), fold * won], axis=0)
        b_ref[pl.ds(g * 8, 8), :] = u_s[:, :]
        return carry

    jax.lax.fori_loop(0, tt // 8, group, 0, unroll=1)


@functools.partial(jax.jit,
                   static_argnames=("t_real", "rd", "s_count", "tt",
                                    "interpret"))
def _viterbi_2d(ll2, sgn_in, t_real: int, rd: int, s_count: int, tt: int,
                interpret: bool = False):
    """(T_pad*rd, B) time-major LLRs + (S, 2*rd) sign table ->
    (T_pad, B) decoded bits (rows past t_real undefined)."""
    tprd, b = ll2.shape
    t_pad = tprd // rd
    nj = t_pad // tt
    bt = 128
    while bt * 2 <= min(b, 512) and b % (bt * 2) == 0:
        bt *= 2
    grid = (b // bt, nj)
    decisions = pl.pallas_call(
        functools.partial(_fwd_kernel, tt=tt, rd=rd, s_count=s_count,
                          t_real=t_real),
        grid=grid,
        in_specs=[pl.BlockSpec((s_count, 2 * rd), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tt * rd, bt), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tt * s_count, bt), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad * s_count, b), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((s_count, bt), jnp.float32)],
        interpret=interpret,
    )(sgn_in, ll2)

    bits = pl.pallas_call(
        functools.partial(_bwd_kernel, tt=tt, s_count=s_count,
                          t_real=t_real, nj=nj),
        grid=grid,
        in_specs=[pl.BlockSpec((tt * s_count, bt),
                               lambda i, j, nj=nj: (nj - 1 - j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tt, bt), lambda i, j, nj=nj: (nj - 1 - j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_count, bt), jnp.float32),
                        pltpu.VMEM((8, bt), jnp.float32)],
        interpret=interpret,
    )(decisions)
    return bits


def viterbi_decode_pallas(code, llrs: jnp.ndarray, nbits: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``packet.fec.viterbi_decode`` on TPU: (..., rd*(nbits
    + K-1)) LLRs -> (..., nbits) hard bits.  Any batch shape (flattened
    internally; batch padded to the 128-lane granule with zeros)."""
    from qpsk_tpu.packet.fec import _trellis

    k, s_count, rd = code.constraint, code.nstates, code.rate_den
    nsteps = nbits + k - 1
    assert llrs.shape[-1] == rd * nsteps, (llrs.shape, rd * nsteps)
    batch = llrs.shape[:-1]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    flat = llrs.astype(jnp.float32).reshape(b, rd * nsteps)
    bpad = (-b) % 128
    if bpad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((bpad, rd * nsteps), jnp.float32)])
    tt = 32
    t_pad = -(-nsteps // tt) * tt
    ll = flat.reshape(b + bpad, nsteps, rd)
    if t_pad != nsteps:
        ll = jnp.concatenate(
            [ll, jnp.zeros((b + bpad, t_pad - nsteps, rd), jnp.float32)],
            axis=1)
    ll2 = jnp.moveaxis(ll, 0, -1).reshape(t_pad * rd, b + bpad)

    _, sgns_np = _trellis(code)
    # (S, 2*rd) sign table, column q*2 + p (a replicated VMEM kernel
    # input — Pallas kernels cannot capture array constants)
    sgn_in = jnp.asarray(np.stack(
        [sgns_np[q, :, p] for q in range(rd) for p in range(2)], axis=1))
    bits2 = _viterbi_2d(ll2, sgn_in, t_real=nsteps, rd=rd,
                        s_count=s_count, tt=tt, interpret=interpret)
    bits = bits2[:nsteps].T[:b].astype(jnp.int32)       # (b, T)
    return bits[:, :nbits].reshape(batch + (nbits,))
