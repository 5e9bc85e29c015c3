"""Fused RX front-end kernel (Pallas / Mosaic TPU).

One kernel fuses the whole pre-Costas RX chain of rx_frame
(qpsk.c:114-191): int16 PCM -> f32 scale -> RRC matched filter with
carrier-MODULATED complex taps (the NCO mix folded into the filter,
ops/frontend.py) -> per-frame symbol-timing energies -> argmax phase ->
decimation -> per-pick carrier phasor — emitting only the decimated symbol
picks and the timing index.  The XLA lowering of the same chain makes
~5 HBM round trips (convert+mix write, FIR window read + filtered write,
energy read, decimate read + picks write, ~44 bytes/sample); this kernel
reads the raw int16 PCM once and writes 2 f32 picks per symbol
(~4 bytes/sample) — the front-end is HBM-minimal and MXU-bound.

Numerics / design notes:

* **The mix is gone, not moved**: with a constant-frequency NCO the mix
  commutes with the LTI filter, so the taps absorb ``e^{j*omega*k}`` (a
  static f64-designed table) and the carrier phasor touches only the
  decimated picks (1/cycles rate).  Timing energies are carrier-invariant
  (|phasor| = 1) and never need it.  This removed the two full-rate mixed
  planes the round-2 kernel built on the VPU (~16 % of kernel time) and
  halves the matmul's input-side reads (one real plane, not two mixed
  ones).  The staged XLA twin (``modem.frontend_xla``) uses the SAME
  modulated-tap tables, so both lowerings feed identical operands to the
  MXU and agree on near-tie timing picks even under bf16 truncation.
* The per-pick phasor ``phase0 (x) e^{j*omega*(pos+1)}`` cannot be
  evaluated at f32 for stream positions ~ 1e7 (f32 loses radians).  It
  factors exactly into ``phase0 (x) base_j (x) W[lane] (x) e^{j*omega*p}``
  with ``base_j = e^{j*omega*j*B}`` per grid block (tiny SMEM scalars,
  f64 host-side), a static lane table ``W[l] = e^{j*omega*(l*cycles+1)}``
  and the cycles tiny constants — each factor f64-accurate.
* The raw-PCM window is the int16 body block + the previous block's last
  128 raw samples carried in VMEM scratch (the time-tile grid axis is
  sequential); the cross-call delay-line tail enters as a 128-wide raw
  side input used by block 0 (un-mixed from the carried mixed-domain
  state by the host wrapper).
* Timing matches ``timing_power`` + ``decimate_select`` exactly when one
  grid block == ``g`` modem frames; per-frame energies and the phase
  selection stay on the VPU in full f32 (static iota frame masks +
  full-width reductions): routing them through an MXU segment matmul
  truncates the operands to bf16 and near-tie phase energies then argmax
  differently from the XLA chain (measured: ~27 % of frames flipped).
* Matmul precision mirrors the XLA fast path (DEFAULT, one bf16 MXU pass,
  ~0.3 % under any channel noise floor); the parity path (fir_precision
  "exact") never engages this kernel.
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

# emit the per-frame AGC power in lane 1 of the idx output plane instead
# of a dedicated (C, nb*128) output (saves one full plane HBM write +
# consumer re-read on AGC configs).  Round-5 measured NEGATIVE result
# (don't retry): the lane-1 packing reads 3% SLOWER on AGC configs
# (qpsk+agc 24.2 vs 24.9, 16qam+agc 22.45 vs 23.1; interleaved
# same-process, tools/sweep_fe_pwlane.py) — the [idx | pw | zeros]
# 3-piece lane concat at offsets 0/1/2 in the kernel epilogue is a
# sub-tile lane shuffle that costs more than the ~80 us/pass of HBM it
# saves (the same Mosaic lane-offset cost class that sank the cw=128
# contraction).  NOT a jit static arg: flip only with the launch
# wrappers' jit caches cleared (the sweep tool does).
_PW_LANE = False

# fold the selected-phase carrier factor into the (CT, 1) phasor stage at
# g == 1 (see _kernel).  Round-5 measured NEGATIVE result (don't retry):
# despite removing ~12 full-plane VPU ops per block, the fold reads ~6%
# SLOWER composed (27.0-27.1 vs 28.9 GS/s at 8192x8, interleaved
# same-process A/B, tools/sweep_fe_fold.py) — the (CT, 1) x (1, gnsym)
# double-broadcast multiplies schedule worse in Mosaic than the wide
# planes they replace.  NOT a jit static arg: flip only with the launch
# wrappers' jit caches cleared (the sweep tool does).
_FOLD_ROT = False


def _kernel(base_r_ref, base_i_ref, tre_ref, tim_ref, wtab_ref,
            phase0_ref, tail_ref, *refs, gain: float, pcm_scale: float,
            cycles: int, g: int, omega: float, tm_delay: bool, cw: int,
            stack: bool = True, fuse_planes: bool = True,
            emit_power: bool = False, interpret_mode: bool = False):
    pw_ref = None
    if tm_delay and emit_power and _PW_LANE:
        (ddin_r_ref, ddin_i_ref, body_ref, pr_ref, pi_ref, idx_ref,
         ddout_r_ref, ddout_i_ref, halo_s, dly_r_s, dly_i_s,
         sq_r_s, sq_i_s) = refs
    elif tm_delay and emit_power:
        (ddin_r_ref, ddin_i_ref, body_ref, pr_ref, pi_ref, idx_ref,
         ddout_r_ref, ddout_i_ref, pw_ref, halo_s, dly_r_s, dly_i_s,
         sq_r_s, sq_i_s) = refs
    elif tm_delay:
        (ddin_r_ref, ddin_i_ref, body_ref, pr_ref, pi_ref, idx_ref,
         ddout_r_ref, ddout_i_ref, halo_s, dly_r_s, dly_i_s) = refs
    else:
        body_ref, pr_ref, pi_ref, idx_ref, halo_s = refs
    j = pl.program_id(1)
    b = body_ref.shape[1]
    ct = body_ref.shape[0]
    inv = jnp.float32(1.0 / pcm_scale)

    # raw f32 window: halo (previous block's last 128 raw samples, carried
    # in VMEM scratch — the time-tile grid axis is sequential, so the
    # scratch persists across j; re-reading the previous PCM block from
    # HBM would double the int16 traffic) + this block's body
    body = body_ref[:, :].astype(jnp.float32) * inv
    halo = jnp.where(j == 0, tail_ref[:, :], halo_s[:, :])
    x = jnp.concatenate([halo, body], axis=1)            # (CT, B + 128)
    halo_s[:, :] = body[:, b - _HALO:]

    # matched filter (modulated taps) + decimation in one, CHUNKED against
    # the Toeplitz structural zeros: the band matrix only has 128 nonzero
    # rows per output column, so a dense (W, B) matmul wastes
    # (B+128)/127 ~ 5x of its MACs at B=512 (9x at the 1200-baud
    # grouping).  Splitting the outputs into K chunks of ``cw`` samples,
    # each contracting only its own (cw + 128)-row band, cuts the waste to
    # (cw+128)/127 ~ 3x at cw=256 while keeping every matmul a full
    # (CT, cw+128) x (cw+128, cw) tile.  Chunk columns are phase-major
    # (phase p's cw/cycles symbols contiguous) so the per-phase decimated
    # signal reassembles as a static lane concat — the undecimated signal
    # is never materialized and no lane-splitting reshape is needed
    # (Mosaic can't shape-cast (CT, B) -> (CT, nsym, cycles)).  Each grid
    # step covers ``g`` modem frames (g = 128 // symbols_per_frame keeps
    # the picks lane-dim on the 128 granule for small frames, e.g.
    # 1200 baud).
    gn = jnp.float32(gain)
    nchunks = b // cw
    mc = cw // cycles                                    # symbols/chunk/phase
    gnsym = nchunks * mc                                 # symbols per block
    nsym = gnsym // g
    # ONE (cw+128, cw) table shared by every chunk: the Toeplitz band is
    # shift-invariant, so all chunk slices of the full band matrix are the
    # SAME matrix (verified numerically) — the round-3 layout stacked
    # per-chunk copies, which read as distinct weights and re-paid the
    # stationary-operand load per dot.  At cw=128 the (cw+128)/127
    # structural-zero waste drops to 2.0x (the dense-matmul floor for a
    # 127-band — any output's band spans two 128-row K tiles) vs 3.0x at
    # cw=256, but separate per-chunk dots at cw=128 measured SLOWER on
    # v5e even with the shared table (per-dot overhead ~ the MAC saving).
    # The zero-minimal point is reached by ISSUING FEWER DOTS instead:
    # ``stack`` concatenates the chunk windows along the sublane axis
    # (one (nchunks*CT, cw+128) operand), and ``fuse_planes`` puts the
    # re/im tap planes side by side on the lane axis — together one
    # matmul per block computes every chunk of both planes.
    if stack and nchunks > 1:
        xw = jnp.concatenate(
            [x[:, k * cw:k * cw + cw + _HALO] for k in range(nchunks)],
            axis=0)                                      # (K*CT, cw + 128)
    else:
        xw = None
    chunks_r, chunks_i = [], []
    if fuse_planes:
        # tre_ref holds [re | im] on the lane axis: (cw+128, 2*cw)
        if xw is not None:
            y = jnp.dot(xw, tre_ref[:, :],
                        preferred_element_type=jnp.float32) * gn
            for k in range(nchunks):
                chunks_r.append(y[k * ct:(k + 1) * ct, :cw])
                chunks_i.append(y[k * ct:(k + 1) * ct, cw:])
        else:
            for k in range(nchunks):
                w = x[:, k * cw:k * cw + cw + _HALO]
                y = jnp.dot(w, tre_ref[:, :],
                            preferred_element_type=jnp.float32) * gn
                chunks_r.append(y[:, :cw])
                chunks_i.append(y[:, cw:])
    elif xw is not None:
        yr = jnp.dot(xw, tre_ref[:, :],
                     preferred_element_type=jnp.float32) * gn
        yi = jnp.dot(xw, tim_ref[:, :],
                     preferred_element_type=jnp.float32) * gn
        for k in range(nchunks):
            chunks_r.append(yr[k * ct:(k + 1) * ct])
            chunks_i.append(yi[k * ct:(k + 1) * ct])
    else:
        for k in range(nchunks):
            w = x[:, k * cw:k * cw + cw + _HALO]         # (CT, cw + 128)
            chunks_r.append(
                jnp.dot(w, tre_ref[:, :],
                        preferred_element_type=jnp.float32) * gn)
            chunks_i.append(
                jnp.dot(w, tim_ref[:, :],
                        preferred_element_type=jnp.float32) * gn)
    # g == 1 (one frame per block, the 2400-baud default): every per-frame
    # mask is all-ones — elide the mask multiplies entirely (identity in
    # f32, so bit-exact) in the energy sums and the selection below
    if g > 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gnsym), 1)
        masks = [jnp.where((lane >= f * nsym) & (lane < (f + 1) * nsym),
                           1.0, 0.0).astype(jnp.float32) for f in range(g)]
    yrs, yis, es = [], [], []
    for p in range(cycles):
        yr = jnp.concatenate(
            [c[:, p * mc:(p + 1) * mc] for c in chunks_r], axis=1)
        yi = jnp.concatenate(
            [c[:, p * mc:(p + 1) * mc] for c in chunks_i], axis=1)
        yrs.append(yr)                                   # (CT, g*nsym)
        yis.append(yi)
        e = yr * yr + yi * yi
        if g == 1:
            es.append(jnp.sum(e, axis=1, keepdims=True))
        else:
            es.append(jnp.concatenate(
                [jnp.sum(e * masks[f], axis=1, keepdims=True)
                 for f in range(g)], axis=1))            # (CT, g)

    # first-wins argmax over the per-(frame, phase) energies
    # (timing_power), in f32 arithmetic (no sub-128-lane int ops);
    # ``rot`` accumulates the selected phase's carrier factor
    # e^{j*omega*p} per pick lane on the same one-hots
    emax = es[0]
    for p in range(1, cycles):
        emax = jnp.maximum(emax, es[p])
    taken = jnp.zeros((ct, g), jnp.float32)
    pr = jnp.zeros_like(yrs[0])
    pi = jnp.zeros_like(yis[0])
    # the selected phase's carrier factor e^{j*omega*p} is constant per
    # (channel, frame): at g == 1 accumulate it at (CT, 1) and fold it
    # into the (CT, 1) phasor stage below instead of broadcasting the
    # accumulation (and a dedicated full-width complex-multiply stage)
    # across all gnsym lanes — ~12 fewer full-plane VPU ops per block.
    # Decision-safe: everything upstream of the energy argmax is
    # untouched, so timing picks are bit-identical; only the emitted
    # picks' multiply association changes (closeness-gated vs the XLA
    # twin, and both kernel launch modes share this code so the tm-vs-
    # composed hardware gates stay exact-match).
    fold = _FOLD_ROT and g == 1
    rshape = (ct, g) if fold else yrs[0].shape
    rotr = jnp.zeros(rshape, jnp.float32)
    roti = jnp.zeros(rshape, jnp.float32)
    idxf = jnp.zeros((ct, g), jnp.float32)
    pang = np.mod(omega * np.arange(cycles, dtype=np.float64), 2 * np.pi)
    for p in range(cycles):
        s = jnp.where(es[p] >= emax, 1.0, 0.0) * (1.0 - taken)  # (CT, g)
        taken = taken + s
        idxf = idxf + jnp.float32(p) * s
        if g == 1:
            sx = s                                       # broadcast (CT, 1)
        else:
            sx = masks[0] * s[:, 0:1]                    # (CT, g*nsym)
            for f in range(1, g):
                sx = sx + masks[f] * s[:, f:f + 1]
        rr = s if fold else sx
        rotr = rotr + rr * jnp.float32(np.cos(pang[p]))
        roti = roti + rr * jnp.float32(np.sin(pang[p]))
        pr = pr + sx * yrs[p]
        pi = pi + sx * yis[p]

    # per-pick carrier phasor: phase0 (x) base_j (x) rot (x) W[lane]
    p0r, p0i = phase0_ref[:, 0:1], phase0_ref[:, 1:2]    # (CT, 1)
    bjr, bji = base_r_ref[j], base_i_ref[j]              # SMEM scalars
    cr = p0r * bjr - p0i * bji                           # (CT, 1)
    ci = p0r * bji + p0i * bjr
    wr, wi = wtab_ref[0:1, :], wtab_ref[1:2, :]          # (1, gnsym)
    if fold:
        dr = cr * rotr - ci * roti                       # (CT, 1)
        di = cr * roti + ci * rotr
        gr = dr * wr - di * wi                           # (CT, gnsym)
        gi = dr * wi + di * wr
    else:
        fr = cr * wr - ci * wi                           # (CT, gnsym)
        fi = cr * wi + ci * wr
        gr = fr * rotr - fi * roti
        gi = fr * roti + fi * rotr
    outr = pr * gr - pi * gi
    outi = pr * gi + pi * gr
    if tm_delay:
        # g == 1 here (one modem frame per grid block), so the one-frame
        # decimation delay (qpsk.c:182-191) means THIS block's delayed
        # output is entirely the PREVIOUS block's picks: carry them in
        # VMEM scratch (cross-call boundary block 0 reads the carried
        # decim_delay input), and emit TIME-MAJOR — the in-kernel (CT,
        # nsym) -> (nsym, CT) transpose makes the output plane exactly the
        # layout the fused Costas kernel consumes, so the host-side delay
        # concat AND the (C, T) fold transpose both disappear.
        prev_r = jnp.where(j == 0, ddin_r_ref[:, :], dly_r_s[:, :])
        prev_i = jnp.where(j == 0, ddin_i_ref[:, :], dly_i_s[:, :])
        pr_ref[:, :] = prev_r.T
        pi_ref[:, :] = prev_i.T
        dly_r_s[:, :] = outr
        dly_i_s[:, :] = outi
        if emit_power:
            # per-frame mean |pick|^2 of the EMITTED (delayed) picks —
            # the frame-rate AGC's measurement (ops/agc._frame_power),
            # computed here for free while the picks are in VMEM: the
            # XLA-side computation re-read the full symbol planes from
            # HBM and materialized the barrier-staged squares, costing
            # 16QAM+AGC ~19% of the whole RX rate.  Bit-equality with the
            # XLA twin: squares staged through VMEM scratch (Mosaic
            # would FMA-contract ``a*a + b*b``; the scratch round trip
            # pins each square's rounding like the XLA barrier does),
            # then the SAME halves-pairing add tree, then the same
            # 1/nsym multiply.
            if interpret_mode:
                # interpret runs under the same XLA backend as the
                # ops/agc twin: use ITS pinning construct (the scratch
                # round trip is transparent to XLA fusion, so it would
                # not pin anything there) — structural identity is bit
                # identity (the dd-kernel stage() pattern)
                a2, b2 = jax.lax.optimization_barrier(
                    (prev_r * prev_r, prev_i * prev_i))
            else:
                sq_r_s[:, :] = prev_r * prev_r
                sq_i_s[:, :] = prev_i * prev_i
                a2, b2 = sq_r_s[:, :], sq_i_s[:, :]
            pw = a2 + b2                                # (CT, nsym)
            m = pw.shape[1]
            while m > 1:
                pw = pw[:, :m // 2] + pw[:, m // 2:m]
                m //= 2
            inv = jnp.float32(1.0 / prev_r.shape[1])
            if _PW_LANE:
                # ride LANE 1 of the idx output plane (g == 1 in tm
                # mode, so its lanes [1:] are zero padding anyway): a
                # dedicated power plane costs a full (C, nb*128) HBM
                # write + consumer re-read for one value per frame
                pw_lane = pw * inv                      # (CT, 1)
            else:
                pw_ref[:, :] = jnp.concatenate(
                    [pw * inv,
                     jnp.zeros((pw.shape[0], 127), jnp.float32)], axis=1)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            # the stream's final picks become the next call's decim_delay
            ddout_r_ref[:, :] = outr
            ddout_i_ref[:, :] = outi
    else:
        pr_ref[:, :] = outr
        pi_ref[:, :] = outi
    # the selected phase per frame, already resolved by the first-wins
    # one-hot above, in the first g lanes (zero-padded to the 128-lane
    # Mosaic block granule) — the host just slices and casts, instead of
    # re-reading a full energy vector and argmaxing it.  (Accumulating
    # the per-block index into lane j of a write-once scratch — 128x less
    # idx HBM — measured 1% SLOWER: the full-width select+add per block
    # costs more than the write it saves.  Don't retry.)
    if tm_delay and emit_power and _PW_LANE:
        idx_ref[:, :] = jnp.concatenate(
            [idxf, pw_lane, jnp.zeros((ct, 127 - g), jnp.float32)], axis=1)
    else:
        idx_ref[:, :] = jnp.concatenate(
            [idxf, jnp.zeros((ct, 128 - g), jnp.float32)], axis=1)


@functools.lru_cache(maxsize=None)
def _tables(taps_key: tuple, block: int, omega: float, cycles: int,
            cw: int):
    """(tm_re, tm_im, wtab) static constants.

    ``tm_re/tm_im`` is THE (cw + 128, cw) slice of the banded Toeplitz
    planes of the *modulated* taps ``hm[k] = h[k] * e^{j*omega*(k-D)}``
    (ops/frontend.py) — one table shared by every output chunk (the band
    is shift-invariant, so every chunk's slice of the full matrix is the
    same matrix): rows are a chunk's 128-halo raw-input window, and the
    columns are its cw output samples reordered PHASE-MAJOR (phase p's
    cw/cycles symbols contiguous), so each chunk matmul is the mix-free
    filtered signal of that window already grouped by decimation phase.
    ``cw == block`` degenerates to the dense layout (one chunk, all
    structural zeros); ``cw == 128`` is the zero-minimal operating point
    (2.0x MAC waste, the dense floor for a 127-band).  ``wtab`` is the
    static pick-phasor lane table W[l] = e^{j*omega*(l*cycles + 1)},
    f64-designed.
    """
    from qpsk_tpu.ops.frontend import modulated_taps_np
    from qpsk_tpu.ops.rrc import toeplitz_taps

    hm = modulated_taps_np(taps_key, omega)              # (2, ntaps)
    pad = _HALO - (hm.shape[1] - 1)
    assert pad >= 0, "ntaps too large for the 128 halo"
    assert block % cw == 0 and cw % cycles == 0, (block, cw, cycles)
    cols = np.concatenate([np.arange(p, cw, cycles) for p in range(cycles)])

    def chunked(tp):
        # padded tap length = pad + ntaps = _HALO + 1, so the band matrix
        # always has block + _HALO rows: the slice is full-size for every
        # valid cw (including the cw == block dense degenerate)
        full = toeplitz_taps(
            np.concatenate([np.zeros(pad, np.float32), tp]), block)
        t = full[:cw + _HALO][:, cols]
        assert t.shape[0] == cw + _HALO, (t.shape, cw)
        return t

    lanes = np.arange(block // cycles, dtype=np.float64) * cycles + 1.0
    ang = np.mod(omega * lanes, 2.0 * np.pi)
    wtab = np.stack([np.cos(ang), np.sin(ang)]).astype(np.float32)
    return chunked(hm[0]), chunked(hm[1]), wtab


def _bases(omega: float, nb: int, block: int) -> np.ndarray:
    """Per-block start phasors exp(j*omega*j*B), f64-wrapped."""
    ang = np.mod(omega * np.arange(nb, dtype=np.float64) * block,
                 2.0 * np.pi)
    return np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)


def _table_operands(taps_key, block: int, omega: float, cycles: int,
                    cw: int, fuse_planes: bool):
    """(tre, tim, tre_spec, tim_spec) kernel operands for the tap tables.
    With ``fuse_planes`` the re/im planes sit side by side on the lane
    axis of ONE table (tre) and ``tim`` is a tiny unused placeholder."""
    tre_np, tim_np, wtab_np = _tables(taps_key, block, omega, cycles, cw)
    if fuse_planes:
        tre = jnp.asarray(np.concatenate([tre_np, tim_np], axis=1))
        tim = jnp.zeros((8, 128), jnp.float32)
        tre_spec = pl.BlockSpec((cw + _HALO, 2 * cw), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        tim_spec = pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        tre, tim = jnp.asarray(tre_np), jnp.asarray(tim_np)
        tre_spec = tim_spec = pl.BlockSpec(
            (cw + _HALO, cw), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return tre, tim, jnp.asarray(wtab_np), tre_spec, tim_spec


@functools.partial(
    jax.jit, static_argnames=("taps_key", "block", "ct", "gain", "pcm_scale",
                              "cycles", "g", "omega", "cw", "stack",
                              "fuse_planes", "interpret"))
def _frontend_2d(pcm, tail_raw, phase0, taps_key, block: int, ct: int,
                 gain: float, pcm_scale: float, cycles: int, g: int,
                 omega: float, cw: int, stack: bool = True,
                 fuse_planes: bool = True, interpret: bool = False):
    c, n = pcm.shape
    nb = n // block
    tre, tim, wtab, tre_spec, tim_spec = _table_operands(
        taps_key, block, omega, cycles, cw, fuse_planes)
    bases_np = _bases(omega, nb, block)
    bases_r = jnp.asarray(bases_np[:, 0])
    bases_i = jnp.asarray(bases_np[:, 1])

    grid = (c // ct, nb)
    body_spec = pl.BlockSpec((ct, block), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, gain=gain, pcm_scale=pcm_scale,
                             cycles=cycles, g=g, omega=omega, tm_delay=False,
                             cw=cw, stack=stack, fuse_planes=fuse_planes)
    gnsym = block // cycles
    out_shape = (jax.ShapeDtypeStruct((c, n // cycles), jnp.float32),
                 jax.ShapeDtypeStruct((c, n // cycles), jnp.float32),
                 jax.ShapeDtypeStruct((c, nb * 128), jnp.float32))
    pr, pi, idxf = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tre_spec,
            tim_spec,
            pl.BlockSpec((2, gnsym), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, _HALO), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            body_spec,
        ],
        out_specs=(
            pl.BlockSpec((ct, gnsym), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, gnsym), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ct, _HALO), jnp.float32)],
        interpret=interpret,
    )(bases_r, bases_i, tre, tim, wtab, phase0, tail_raw, pcm)
    idx = idxf.reshape(c, nb, 128)[..., :g].astype(jnp.int32)
    return pr, pi, idx.reshape(c, nb * g)


@functools.partial(
    jax.jit, static_argnames=("taps_key", "block", "ct", "gain", "pcm_scale",
                              "cycles", "omega", "cw", "stack",
                              "fuse_planes", "want_power", "interpret"))
def _frontend_2d_tm(pcm, tail_raw, phase0, dd_r, dd_i, taps_key, block: int,
                    ct: int, gain: float, pcm_scale: float, cycles: int,
                    omega: float, cw: int, stack: bool = True,
                    fuse_planes: bool = True, want_power: bool = True,
                    interpret: bool = False):
    """tm_delay launch (g == 1): emits the one-frame-DELAYED picks
    TIME-MAJOR as (T, C) planes — the exact input layout of the fused
    Costas kernel — plus the stream-final picks as the next decim_delay.
    """
    c, n = pcm.shape
    nb = n // block
    nsym = block // cycles
    t = n // cycles
    tre, tim, wtab, tre_spec, tim_spec = _table_operands(
        taps_key, block, omega, cycles, cw, fuse_planes)
    bases_np = _bases(omega, nb, block)
    bases_r = jnp.asarray(bases_np[:, 0])
    bases_i = jnp.asarray(bases_np[:, 1])

    grid = (c // ct, nb)
    # per-frame pick-power emission (the frame-rate AGC's measurement)
    # needs the in-kernel halves tree, which wants a power-of-two symbol
    # count; every real config satisfies it (nsym = 128 at 2400 baud)
    emit_power = want_power and nsym >= 2 and (nsym & (nsym - 1)) == 0
    body_spec = pl.BlockSpec((ct, block), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, gain=gain, pcm_scale=pcm_scale,
                             cycles=cycles, g=1, omega=omega, tm_delay=True,
                             cw=cw, stack=stack, fuse_planes=fuse_planes,
                             emit_power=emit_power, interpret_mode=interpret)
    dd_spec = pl.BlockSpec((ct, nsym), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((t, c), jnp.float32),
                 jax.ShapeDtypeStruct((t, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, nb * 128), jnp.float32),
                 jax.ShapeDtypeStruct((c, nsym), jnp.float32),
                 jax.ShapeDtypeStruct((c, nsym), jnp.float32))
    out_specs = (
        pl.BlockSpec((nsym, ct), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nsym, ct), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, 128), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        dd_spec, dd_spec,
    )
    scratch = [pltpu.VMEM((ct, _HALO), jnp.float32),
               pltpu.VMEM((ct, nsym), jnp.float32),
               pltpu.VMEM((ct, nsym), jnp.float32)]
    if emit_power:
        if not _PW_LANE:
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((c, nb * 128), jnp.float32),)
            out_specs = out_specs + (
                pl.BlockSpec((ct, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),)
        # square-staging scratches (the _frame_power pin)
        scratch = scratch + [pltpu.VMEM((ct, nsym), jnp.float32)] * 2
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tre_spec,
            tim_spec,
            pl.BlockSpec((2, nsym), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, _HALO), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            dd_spec, dd_spec,
            body_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(bases_r, bases_i, tre, tim, wtab, phase0, tail_raw, dd_r, dd_i, pcm)
    zr, zi, idxf, ndd_r, ndd_i = outs[:5]
    planes = idxf.reshape(c, nb, 128)
    idx = planes[..., :1].astype(jnp.int32)
    powers = None
    if emit_power:
        # (F, C) per-frame mean |pick|^2 of the emitted (delayed) picks —
        # from lane 1 of the idx plane (one plane round-trips HBM instead
        # of two) or from the dedicated plane when _PW_LANE is off
        if _PW_LANE:
            powers = planes[..., 1].T
        else:
            powers = outs[5].reshape(c, nb, 128)[..., 0].T
    return zr, zi, idx.reshape(c, nb), ndd_r, ndd_i, powers


# FIR contraction knobs (overridable for A/B sweeps; see _kernel and
# tools/sweep_fe_cw.py).  Round-5 measured NEGATIVE result (don't retry):
# cw=128 is the zero-minimal dense contraction (2.0x MAC waste vs 3.0x at
# cw=256 — the floor for a 127-band, whose two 128-row K tiles any output
# must span), and EVERY cw=128 issue structure loses ~15% composed RX at
# 8192x8 on v5e — separate shared-table dots 23.9-24.5 GS/s, sublane-
# stacked single dot 24.1-24.4, re|im lane-fused 24.1-24.5, vs 28.4-28.9
# at cw=256 (3 interleaved same-process rounds).  The MAC count is NOT
# the lever: the phase-major reassembly slices halve to 32 lanes at
# cw=128 and the extra sub-tile lane shuffles swamp the ~87 us/pass the
# MXU saving is worth.  Plane fusion at cw=256 ties (28.6-28.7) — dot
# count isn't the lever either.  cw=256 is a genuine local optimum of
# this design family (cw=512 dense lost in round 3 from the 5x MAC
# waste; mc=128-aligned phase slices require exactly that dense shape).
_CW_PREF = 256
_STACK = False
_FUSE = False


def _pick_cw(block: int, cycles: int) -> int:
    for cand in (_CW_PREF, 256, 128):
        if cand and block % cand == 0 and cand % cycles == 0:
            return cand
    return block


def _group(cfg, fsz: int) -> int:
    """Frames per grid block: small frames (1200 baud: 64 sym) group so the
    picks lane-dim lands on the 128 granule."""
    nsym = fsz // cfg.cycles
    return max(1, 128 // nsym)


def frontend_supported(cfg, batch_shape, fsz: int,
                       nframes: int | None = None) -> bool:
    """Whether the fused kernel covers this configuration (the XLA chain
    handles everything else)."""
    nsym = fsz // max(cfg.cycles, 1)
    g = max(1, 128 // max(nsym, 1))
    return (len(batch_shape) == 1 and batch_shape[0] % 8 == 0
            and fsz % 128 == 0 and fsz % cfg.cycles == 0
            # the picks lane-dim (g frames per block) must tile the
            # 128-lane Mosaic granule
            and (g * nsym) % 128 == 0
            and (nframes is None or nframes % g == 0)
            and cfg.ntaps - 1 <= _HALO
            and cfg.timing_mode == "power"
            and cfg.fir_precision == "fast")


def rx_frontend_fused(cfg, pcm: jnp.ndarray, nco_phase: CF32,
                      fir_tail: CF32, interpret: bool = False):
    """Fused front-end over (C, nframes, frame_size) int16 PCM.

    Drop-in for the ``frontend_xla`` slice of ``_rx_stream_fused``:
    consumes/produces the SAME RxState fields (mixed-domain CF32
    ``fir_tail``, unit-phasor ``nco_phase``), so calls chain
    interchangeably with the XLA path.  Returns
    (picks CF32 (C, nframes, nsym), index (C, nframes) int32,
    new_nco_phase, new_fir_tail).
    """
    from qpsk_tpu.modem import taps_for
    from qpsk_tpu.ops import frontend as fe

    interpret = interpret or jax.default_backend() != "tpu"
    c, nframes, fsz = pcm.shape
    n = nframes * fsz
    omega = float(-cfg.omega_center)
    ntaps_m1 = cfg.ntaps - 1
    # pad the channel axis to the 8-sublane grid granule (zero channels
    # decimate at phase 0 and are sliced away below)
    c_in = c
    cpad = (-c) % 8
    if cpad:
        pcm = jnp.concatenate(
            [pcm, jnp.zeros((cpad,) + pcm.shape[1:], pcm.dtype)])
        nco_phase = CF32(jnp.concatenate([nco_phase.re,
                                          jnp.ones((cpad,), jnp.float32)]),
                         jnp.concatenate([nco_phase.im,
                                          jnp.zeros((cpad,), jnp.float32)]))
        fir_tail = CF32(
            jnp.concatenate([fir_tail.re,
                             jnp.zeros((cpad,) + fir_tail.shape[1:],
                                       jnp.float32)]),
            jnp.concatenate([fir_tail.im,
                             jnp.zeros((cpad,) + fir_tail.shape[1:],
                                       jnp.float32)]))
        c += cpad
    flat = pcm.reshape(c, n)

    # carried mixed-domain tail -> raw PCM halo for block 0
    raw_tail = fe.unmix_tail(fir_tail, nco_phase, omega)  # (C, 126)
    pad = jnp.zeros((c, _HALO - ntaps_m1), jnp.float32)
    tail128 = jnp.concatenate([pad, raw_tail], axis=1)    # (C, 128)

    phase0 = jnp.stack([nco_phase.re, nco_phase.im], axis=1)  # (C, 2)

    # measured on v5e (2048 ch x 16 frames): ct 256 beats 128 by ~10%
    # (taller matmuls amortize fixed per-dot costs); 512 regresses and
    # 1024 exceeds the 16 MB scoped-VMEM budget
    ct = 8
    while ct * 2 <= min(c, 256) and c % (ct * 2) == 0:
        ct *= 2
    g = _group(cfg, fsz)
    assert nframes % g == 0, (nframes, g)
    taps_key = tuple(np.asarray(taps_for(cfg)).tolist())
    block = g * fsz
    cw = _pick_cw(block, cfg.cycles)
    prr, pii, idx = _frontend_2d(flat, tail128, phase0, taps_key,
                                 block=block, ct=ct, gain=float(cfg.gain),
                                 pcm_scale=float(cfg.pcm_scale),
                                 cycles=cfg.cycles, g=g, omega=omega,
                                 cw=cw, stack=_STACK, fuse_planes=_FUSE,
                                 interpret=interpret)
    nsym = fsz // cfg.cycles
    picks = CF32(prr.reshape(c, nframes, nsym)[:c_in],
                 pii.reshape(c, nframes, nsym)[:c_in])
    idx = idx[:c_in]
    flat_in = flat[:c_in].astype(jnp.float32) / jnp.float32(cfg.pcm_scale)
    nco_phase = CF32(nco_phase.re[:c_in], nco_phase.im[:c_in])

    # carried state, same contract as the XLA path (shared helpers)
    new_phase = fe.advance_phase(nco_phase, omega, n)
    new_tail = fe.remix_tail(flat_in, nco_phase, omega, ntaps_m1)
    return picks, idx, new_phase, new_tail


def frontend_tm_supported(cfg, batch_shape, fsz: int,
                          nframes: int | None = None) -> bool:
    """Whether the time-major + in-kernel-delay launch covers this
    configuration: the base kernel support, PLUS one whole frame per grid
    block (g == 1, i.e. >= 128 symbols/frame) and a 128-multiple channel
    count (the fused Costas consumer's lane requirement — no channel
    padding, the emitted (T, C) plane feeds it as-is)."""
    nsym = fsz // max(cfg.cycles, 1)
    return (frontend_supported(cfg, batch_shape, fsz, nframes)
            and nsym >= 128
            and batch_shape[0] % 128 == 0)


def rx_frontend_fused_tm(cfg, pcm: jnp.ndarray, nco_phase: CF32,
                         fir_tail: CF32, decim_delay: CF32,
                         want_power: bool | None = None,
                         interpret: bool = False):
    """Fused front-end INCLUDING the one-frame decimation delay, emitting
    time-major symbol planes.

    Covers the whole pre-Costas slice of ``_rx_stream_fused``: the
    returned ``(zr_tm, zi_tm)`` are the one-frame-DELAYED rotated picks as
    (T, C) planes — exactly what ``costas_run_pallas_tm`` consumes — so
    the host-side delay concat and the (C, T) fold transpose both vanish
    from the RX hot path.  Values are bit-identical to
    ``rx_frontend_fused`` + the host delay concat (same stores, no new
    arithmetic; the in-kernel transpose moves data, not bits).

    Returns ``(zr_tm, zi_tm, index (C, nframes) int32, new_nco_phase,
    new_fir_tail, new_decim_delay, powers)`` where ``powers`` is the
    (nframes, C) per-frame mean |pick|^2 of the emitted planes — the
    frame-rate AGC measurement computed in-kernel for free (bit-identical
    to ``ops/agc._frame_power`` on the same picks; None when disabled or
    nsym is not a power of two).  ``want_power`` defaults to
    ``cfg.agc`` — non-AGC configs skip the in-kernel tree entirely.
    Requires ``frontend_tm_supported(...)``.
    """
    from qpsk_tpu.modem import taps_for
    from qpsk_tpu.ops import frontend as fe

    interpret = interpret or jax.default_backend() != "tpu"
    if want_power is None:
        want_power = bool(cfg.agc)
    c, nframes, fsz = pcm.shape
    nsym = fsz // cfg.cycles
    assert c % 128 == 0 and nsym >= 128 and nsym % 128 == 0, (c, nsym)
    n = nframes * fsz
    omega = float(-cfg.omega_center)
    ntaps_m1 = cfg.ntaps - 1
    flat = pcm.reshape(c, n)

    raw_tail = fe.unmix_tail(fir_tail, nco_phase, omega)
    pad = jnp.zeros((c, _HALO - ntaps_m1), jnp.float32)
    tail128 = jnp.concatenate([pad, raw_tail], axis=1)
    phase0 = jnp.stack([nco_phase.re, nco_phase.im], axis=1)

    ct = 128
    while ct * 2 <= min(c, 256) and c % (ct * 2) == 0:
        ct *= 2
    taps_key = tuple(np.asarray(taps_for(cfg)).tolist())
    block = fsz
    cw = _pick_cw(block, cfg.cycles)
    zr, zi, idx, ndd_r, ndd_i, powers = _frontend_2d_tm(
        flat, tail128, phase0, decim_delay.re, decim_delay.im, taps_key,
        block=block, ct=ct, gain=float(cfg.gain),
        pcm_scale=float(cfg.pcm_scale), cycles=cfg.cycles, omega=omega,
        cw=cw, stack=_STACK, fuse_planes=_FUSE, want_power=want_power,
        interpret=interpret)

    flat_in = flat.astype(jnp.float32) / jnp.float32(cfg.pcm_scale)
    new_phase = fe.advance_phase(nco_phase, omega, n)
    new_tail = fe.remix_tail(flat_in, nco_phase, omega, ntaps_m1)
    return zr, zi, idx, new_phase, new_tail, CF32(ndd_r, ndd_i), powers
