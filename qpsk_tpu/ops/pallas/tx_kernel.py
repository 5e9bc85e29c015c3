"""Fused polyphase TX kernel (Pallas / Mosaic TPU).

One kernel fuses the whole TX modulator of tx_frame (qpsk.c:225-264):
QPSK symbols -> zero-stuff upsample x cycles -> 127-tap RRC pulse shaping
-> NCO mix up to the carrier -> Re * pcm_scale -> int16 PCM.

The XLA chain materializes the zero-stuffed signal and dense-filters it:
the Toeplitz matmul spends ``(block + ntaps - 1)`` MACs per output sample
of which 3/4 hit structural zeros (the stuffed lanes).  Here the
upsample-then-filter operator is collapsed into ONE matrix: because the
symbol lands on phase 0 of each ``cycles`` group (qpsk.c:232-237), output
``y[t] = sum_k taps[k] * x[t + k - (ntaps-1)]`` only touches x lanes
``t + k ≡ 0 (mod cycles)`` — so the rows of the dense Toeplitz at
``w ≡ (ntaps-1) mod cycles`` form a ``(Bs + 32, cycles*Bs)`` matrix
``T_int`` mapping a *symbol* window straight to the filtered, upsampled,
interleaved output tile.  Same useful FLOPs, ``cycles``x less MXU work
than the stuffed dense matmul, and the stuffed signal never exists — not
even in VMEM.  The mix rides the same f64-exact factored phasor tables as
the RX front-end kernel (frontend_kernel.py), and the kernel writes int16
PCM directly: HBM traffic is 8 B per symbol in + 2 B per sample out.

State contract: consumes/produces the SAME TxState fields as the XLA path
(``fir_tail`` = last ntaps-1 *zero-stuffed* samples, ``nco_phase`` = unit
phasor), so calls chain interchangeably with tx_stream's XLA lowering.
The tail holds symbols only at stuffed-lane offsets ``k ≡ (ntaps-1) mod
cycles`` (sample counts are multiples of ``cycles``); the wrapper
extracts/rebuilds those lanes with pure slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpsk_tpu.ops.cplx import CF32, cnormalize

_BS = 128          # symbols per grid block (output tile = cycles * _BS)


def _halo_syms(ntaps: int, cycles: int) -> int:
    """Symbol halo: enough history for the oldest tap, padded by one so the
    window width lands on a sublane-friendly multiple of 8."""
    return (ntaps - 1 + cycles - 1) // cycles + 1


def _kernel(base_r_ref, base_i_ref, tint_ref, ramp_ref, phase0_ref,
            tail_ref, body_r_ref, body_i_ref, prev_r_ref, prev_i_ref,
            pcm_ref, *, gain: float, pcm_scale: float, hs: int):
    j = pl.program_id(1)
    bs = body_r_ref.shape[1]

    # symbol window: hs-halo (previous block's last hs symbols, or the
    # carried tail symbols for block 0) + this block's bs symbols.  The
    # oldest halo row of tint is structurally zero, so an over-wide halo
    # entry is harmless.
    tail = tail_ref[:, :]                                # (CT, 2*hs) re|im
    hr = jnp.where(j == 0, tail[:, :hs], prev_r_ref[:, bs - hs:])
    hi = jnp.where(j == 0, tail[:, hs:], prev_i_ref[:, bs - hs:])
    wr = jnp.concatenate([hr, body_r_ref[:, :]], axis=1)  # (CT, bs + hs)
    wi = jnp.concatenate([hi, body_i_ref[:, :]], axis=1)

    # upsample + RRC shape + interleave in ONE matmul per plane
    gn = jnp.float32(gain)
    yr = jnp.dot(wr, tint_ref[:, :],
                 preferred_element_type=jnp.float32) * gn  # (CT, cycles*bs)
    yi = jnp.dot(wi, tint_ref[:, :],
                 preferred_element_type=jnp.float32) * gn

    # NCO mix up: phasor = phase0 (x) base_j (x) ramp[t]
    p0r, p0i = phase0_ref[:, 0:1], phase0_ref[:, 1:2]    # (CT, 1)
    bjr, bji = base_r_ref[j], base_i_ref[j]              # scalars (SMEM)
    cr = p0r * bjr - p0i * bji
    ci = p0r * bji + p0i * bjr
    rr, ri = ramp_ref[0:1, :], ramp_ref[1:2, :]          # (1, cycles*bs)
    out_re = yr * (cr * rr - ci * ri) - yi * (cr * ri + ci * rr)

    # (int16)(re * 16384.0f): C float->int truncates toward zero, as does
    # the convert (qpsk.c:259-261)
    pcm_ref[:, :] = (out_re * jnp.float32(pcm_scale)).astype(jnp.int16)


@functools.lru_cache(maxsize=None)
def _tables(taps_key: tuple, bs: int, omega: float, cycles: int):
    """(tint, ramp) static constants.

    ``tint`` is the polyphase-interleaved operator: rows of the dense
    ``(cycles*bs + ntaps - 1, cycles*bs)`` Toeplitz at window offsets
    ``w ≡ (ntaps-1) mod cycles`` (the only lanes the zero-stuffed signal
    populates), front-padded with zero rows to the (bs + hs) window width.
    ``ramp`` is the within-tile mix table exp(j*omega*(t+1)), f64-designed.
    """
    from qpsk_tpu.ops.rrc import toeplitz_taps
    taps = np.asarray(taps_key, np.float32)
    ntaps = taps.shape[0]
    b_out = cycles * bs
    tfull = toeplitz_taps(taps, b_out)                # (b_out + ntaps-1, b_out)
    r0 = (ntaps - 1) % cycles
    rows = np.arange(r0, b_out + ntaps - 1, cycles)
    tint = tfull[rows]                                # (nsymrows, b_out)
    hs = _halo_syms(ntaps, cycles)
    pad = bs + hs - tint.shape[0]
    assert pad >= 0, (pad, bs, hs, tint.shape)
    tint = np.vstack([np.zeros((pad, b_out), np.float32), tint])
    t = np.arange(1, b_out + 1, dtype=np.float64)
    ramp = np.stack([np.cos(omega * t), np.sin(omega * t)]).astype(np.float32)
    return tint, ramp


def _bases(omega: float, nb: int, b_out: int) -> np.ndarray:
    ang = np.mod(omega * np.arange(nb, dtype=np.float64) * b_out,
                 2.0 * np.pi)
    return np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("taps_key", "ct", "gain", "pcm_scale",
                              "cycles", "omega", "interpret"))
def _tx_2d(sym_re, sym_im, tail_syms, phase0, taps_key, ct: int, gain: float,
           pcm_scale: float, cycles: int, omega: float,
           interpret: bool = False):
    c, s = sym_re.shape
    bs = _BS
    nb = s // bs
    b_out = cycles * bs
    ntaps = len(taps_key)
    hs = _halo_syms(ntaps, cycles)
    tint_np, ramp_np = _tables(taps_key, bs, omega, cycles)
    tint = jnp.asarray(tint_np)
    ramp = jnp.asarray(ramp_np)
    bases_np = _bases(omega, nb, b_out)
    bases_r = jnp.asarray(bases_np[:, 0])
    bases_i = jnp.asarray(bases_np[:, 1])

    grid = (c // ct, nb)
    body = pl.BlockSpec((ct, bs), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((ct, bs), lambda i, j: (i, jnp.maximum(j - 1, 0)),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, gain=gain, pcm_scale=pcm_scale, hs=hs)
    pcm = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bs + hs, b_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2 * hs), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            body, body, prev, prev,
        ],
        out_specs=pl.BlockSpec((ct, b_out), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, s * cycles), jnp.int16),
        interpret=interpret,
    )(bases_r, bases_i, tint, ramp, phase0, tail_syms,
      sym_re, sym_im, sym_re, sym_im)
    return pcm


def tx_supported(cfg, batch_shape, nsym_total: int) -> bool:
    """Whether the fused TX kernel covers this configuration."""
    hs = _halo_syms(cfg.ntaps, cfg.cycles)
    return (len(batch_shape) == 1 and batch_shape[0] % 8 == 0
            and nsym_total % _BS == 0
            and hs <= _BS
            and cfg.cycles >= 2)


def tx_modulate_fused(cfg, symbols: CF32, nco_phase: CF32, fir_tail: CF32,
                      tx_offset_hz: float = 0.0, interpret: bool = False):
    """Fused TX over (C, nsym) symbols -> (C, nsym*cycles) int16 PCM.

    Drop-in for the upsample -> fir_block -> mix -> int16 slice of
    ``tx_stream``; consumes/produces the same TxState fields (zero-stuffed
    ``fir_tail``, unit-phasor ``nco_phase``), so calls chain
    interchangeably with the XLA path.
    """
    from qpsk_tpu.config import TAU
    from qpsk_tpu.modem import taps_for

    interpret = interpret or jax.default_backend() != "tpu"
    c_in, s = symbols.re.shape
    omega = float(TAU * (cfg.center + tx_offset_hz) / cfg.fs)
    ntaps_m1 = cfg.ntaps - 1
    cycles = cfg.cycles
    hs = _halo_syms(cfg.ntaps, cycles)
    # un-tiled symbol counts would leave output blocks unwritten and the
    # tail slice negative-indexed — refuse instead of emitting garbage
    # (tx_supported is the dispatch-level twin of this check)
    assert s % _BS == 0 and s >= hs, (
        f"fused TX needs nsym % {_BS} == 0 and nsym >= {hs}, got {s}")

    sym_re, sym_im = symbols.re, symbols.im
    phase = nco_phase
    tail = fir_tail
    c = c_in
    cpad = (-c) % 8
    if cpad:
        z = jnp.zeros((cpad, s), jnp.float32)
        sym_re = jnp.concatenate([sym_re, z])
        sym_im = jnp.concatenate([sym_im, z])
        phase = CF32(jnp.concatenate([phase.re, jnp.ones((cpad,), jnp.float32)]),
                     jnp.concatenate([phase.im, jnp.zeros((cpad,), jnp.float32)]))
        tz = jnp.zeros((cpad, ntaps_m1), jnp.float32)
        tail = CF32(jnp.concatenate([tail.re, tz]),
                    jnp.concatenate([tail.im, tz]))
        c += cpad

    # --- carried tail -> halo symbols -------------------------------------
    # The zero-stuffed tail holds symbols at lanes k ≡ (ntaps-1) mod cycles
    # (sample counts are multiples of cycles): tail[k0 + cycles*m] is the
    # (nhist - m)-th most recent symbol.
    k0 = (ntaps_m1) % cycles            # oldest symbol lane offset
    hist_re = tail.re[:, k0::cycles]    # (C, nhist)
    hist_im = tail.im[:, k0::cycles]
    nhist = hist_re.shape[1]
    zpad = jnp.zeros((c, hs - nhist), jnp.float32)
    tail_syms = jnp.concatenate(
        [zpad, hist_re, zpad, hist_im], axis=1)          # (C, 2*hs)

    phase0 = jnp.stack([phase.re, phase.im], axis=1)     # (C, 2)

    ct = 8
    while ct * 2 <= min(c, 128) and c % (ct * 2) == 0:
        ct *= 2
    taps_key = tuple(np.asarray(taps_for(cfg)).tolist())
    pcm = _tx_2d(sym_re, sym_im, tail_syms, phase0, taps_key, ct=ct,
                 gain=float(cfg.gain), pcm_scale=float(cfg.pcm_scale),
                 cycles=cycles, omega=omega, interpret=interpret)
    pcm = pcm[:c_in]

    # --- carried state, same contract as the XLA path ---------------------
    n = s * cycles
    ang = float(np.mod(omega * n, 2.0 * np.pi))
    er, ei = jnp.float32(np.cos(ang)), jnp.float32(np.sin(ang))
    new_phase = cnormalize(CF32(nco_phase.re * er - nco_phase.im * ei,
                                nco_phase.re * ei + nco_phase.im * er))
    # new zero-stuffed tail: zeros except the last nhist symbols at their
    # stuffed lanes.  Build by interleaving via reshape (no scatter): a
    # (nhist+1, cycles) grid with column 0 = [0, last nhist symbols]
    # flattens to lanes ≡ 0 (mod cycles); slicing off the first
    # (cycles - k0) lanes leaves symbols at k0 + cycles*m.
    def stuff(plane):
        last = plane[:c_in, s - nhist:]
        col = jnp.concatenate([jnp.zeros((c_in, 1), jnp.float32), last],
                              axis=1)[..., None]          # (C, nhist+1, 1)
        z = jnp.zeros((c_in, nhist + 1, cycles - 1), jnp.float32)
        flat = jnp.concatenate([col, z], axis=2).reshape(c_in, -1)
        return flat[:, cycles - k0:cycles - k0 + ntaps_m1]
    new_tail = CF32(stuff(sym_re), stuff(sym_im))
    return pcm, new_phase, new_tail
