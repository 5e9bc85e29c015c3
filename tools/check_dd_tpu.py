"""Hardware validation of the decision-directed Costas kernel mode
(generic modulation family) — run on the real TPU.

Interpret mode is not sufficient evidence for a Pallas kernel (CLAUDE.md:
Mosaic lowering can round differently; the MXU bf16 truncation bug was
invisible in interpret).  This script runs the DD-mode kernel against the
``lax.scan`` twin on the actual chip for every generic constellation and
reports bit-exactness of the derot planes, freq trace, and final state —
then a whole-``rx_stream`` decode equality (scan vs pallas dispatch) for
8PSK, and a DD-kernel throughput point.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_dd_tpu.py
"""

import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu.ops import costas, modfam
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas_traced

TAU = 2.0 * math.pi


def _symbols(name, c, t, seed, offset_rad=TAU * 50.0 / 2400.0, sigma=0.1):
    mod = modfam.get(name)
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, mod.M, size=(c, t))
    pts = mod.points_re[lab] + 1j * mod.points_im[lab]
    rot = (1.45 * pts * np.exp(1j * offset_rad * np.arange(t)))
    rot = rot + sigma * (rng.standard_normal((c, t))
                         + 1j * rng.standard_normal((c, t)))
    rot = rot.astype(np.complex64)
    return CF32(jnp.asarray(rot.real), jnp.asarray(rot.imag))


def check_kernel_equality():
    p = costas.costas_params(TAU / 100.0)
    all_ok = True
    for name in ("bpsk", "8psk", "16qam"):
        c, t = 256, 2048
        z = _symbols(name, c, t, seed=hash(name) % 1000)
        st0 = costas.costas_init((c,))
        det = modfam.dd_detector(modfam.get(name), scale=1.45)
        dd = (name, 1.45)
        st_r, out_r, ft_r = jax.jit(lambda s, zz: costas.costas_run_traced(
            s, zz, p, detector=det))(st0, z)
        st_p, out_p, ft_p = costas_run_pallas_traced(st0, z, p, dd=dd)
        checks = {
            "out.re": (out_r.re, out_p.re), "out.im": (out_r.im, out_p.im),
            "freq_trace": (ft_r, ft_p),
            "phase": (st_r.phase, st_p.phase), "freq": (st_r.freq, st_p.freq),
        }
        bad = 0
        for cname, (a, b) in checks.items():
            a, b = np.asarray(a), np.asarray(b)
            n = int((a != b).sum())
            if n:
                bad += n
                print(f"  {name} {cname}: {n} mismatches, "
                      f"max |d| = {np.abs(a - b).max():.3e}")
        print(f"{name}: {'BIT-EXACT' if not bad else 'MISMATCH'} "
              f"(c={c}, t={t})")
        all_ok &= bad == 0
    return all_ok


def check_packed_labels():
    """Round 4: the DD kernel's in-line packed-label slicer (emit_label)
    must equal modfam.demod_bits_cmp on its own derot planes, bit-for-bit,
    on hardware (the comparison decisions are boundary-exact, so Mosaic
    and XLA must agree on every symbol — including the in-kernel 4-bit
    packing/unpacking round trip)."""
    from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas_tm

    p = costas.costas_params(TAU / 100.0)
    all_ok = True
    for name in ("bpsk", "8psk", "16qam"):
        c, t = 256, 2048
        z = _symbols(name, c, t, seed=hash(name) % 500 + 7)
        st0 = costas.costas_init((c,))
        _, derot_tm, _, bits = costas_run_pallas_tm(
            st0, z.re.T, z.im.T, p, dd=(name, 1.45), emit_label=True)
        assert bits is not None, f"{name}: emit_label fell back"
        derot = CF32(derot_tm.re.T, derot_tm.im.T)
        ref = modfam.demod_bits_cmp(derot, modfam.get(name), scale=1.45)
        n = int((np.asarray(bits) != np.asarray(ref)).sum())
        print(f"packed labels {name}: "
              f"{'BIT-EXACT' if n == 0 else f'{n} mismatches'}")
        all_ok &= n == 0
    return all_ok


def check_agc_kernel_gains():
    """Round 4: in-kernel per-frame AGC gains == scaling the planes in XLA
    first, bitwise through the whole DD loop (hardware twin of
    tests/test_round4_fixes.py)."""
    from qpsk_tpu.ops import agc as agc_ops
    from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas_tm

    p = costas.costas_params(TAU / 100.0)
    c, f, nsf = 256, 16, 128
    t = f * nsf
    z = _symbols("16qam", c, t, seed=3)
    zr, zi = z.re.T, z.im.T                      # (T, C)
    _, gains = jax.jit(lambda a, b: agc_ops.agc_gains_tm(
        agc_ops.agc_init((c,)), a, b, f, 1.45, 0.25))(zr, zi)
    gx = jnp.repeat(gains, nsf, axis=0)
    st0 = costas.costas_init((c,))
    st_a, d_a, tr_a, b_a = costas_run_pallas_tm(
        st0, zr * gx, zi * gx, p, dd=("16qam", 1.45), emit_label=True)
    st_b, d_b, tr_b, b_b = costas_run_pallas_tm(
        st0, zr, zi, p, dd=("16qam", 1.45), emit_label=True, gains=gains)
    bad = 0
    for nm, a, b in [("derot.re", d_a.re, d_b.re),
                     ("derot.im", d_a.im, d_b.im), ("bits", b_a, b_b),
                     ("freq", st_a.freq, st_b.freq),
                     ("trace", tr_a, tr_b)]:
        n = int((np.asarray(a) != np.asarray(b)).sum())
        if n:
            print(f"  agc {nm}: {n} mismatches")
        bad += n
    print(f"agc in-kernel gains: {'BIT-EXACT' if not bad else 'MISMATCH'}")
    return bad == 0


def check_rx_stream_equality():
    from qpsk_tpu import ModemConfig, rx_init, tx_init
    from qpsk_tpu.modem import rx_stream, tx_stream
    ok = True
    for base in (dict(modulation="8psk"),
                 dict(modulation="16qam", agc=True)):
        rng = np.random.default_rng(9)
        cfg = ModemConfig(**base)
        c, nframes = 128, 8
        bits = jnp.asarray(rng.integers(
            0, 2, (c, nframes, cfg.bits_per_frame), dtype=np.int32))
        _, pcm = tx_stream(cfg, tx_init(cfg, batch_shape=(c,)), bits,
                           tx_offset_hz=30.0)
        pcm = pcm.reshape(c, nframes, cfg.frame_size)
        outs = {}
        for impl in ("scan", "pallas"):
            cc = ModemConfig(**base, costas_impl=impl)
            _, out = jax.jit(lambda s, x, cc=cc: rx_stream(cc, s, x))(
                rx_init(cc, batch_shape=(c,)), pcm)
            outs[impl] = jax.tree.map(np.asarray, out)
        tag = "+".join(str(v) for v in base.values())
        for field in ("bits",):
            a = getattr(outs["scan"], field)
            b = getattr(outs["pallas"], field)
            n = int((a != b).sum())
            ok &= n == 0
            print(f"rx_stream {tag} {field}: "
                  f"{'BIT-EXACT' if n == 0 else f'{n} mismatches'}")
    return ok


def bench_dd_throughput(name="8psk", c=2048, t=4096, iters=60):
    """Chained-dispatch timing (benchmarks._time_chained discipline): a
    per-call host sync on the relayed backend measures the ~30 ms relay
    round trip, not the kernel — the first version of this bench read
    0.2 Gsym/s for the QPSK kernel too."""
    p = costas.costas_params(TAU / 100.0)
    # stimulus constellation is irrelevant to timing; qpsk (baseline
    # sign-detector kernel) borrows the 8psk symbol generator
    z = _symbols("8psk" if name == "qpsk" else name, c, t, seed=1)
    st0 = costas.costas_init((c,))
    dd = None if name == "qpsk" else (name, 1.45)

    @jax.jit
    def step(s, zz):
        st, out, _ = costas_run_pallas_traced(s, zz, p, dd=dd,
                                              trace_every=t)
        return st, jnp.sum(out.re[:, -1])

    for _ in range(3):
        st, chk = step(st0, z)
    float(chk)
    t0 = time.perf_counter()
    st = st0
    for _ in range(iters):
        st, chk = step(st, z)
    float(chk)
    dt = time.perf_counter() - t0
    rate = c * t * iters / dt / 1e9
    print(f"dd kernel {name}: {rate:.1f} Gsym/s at c={c}, t={t} "
          f"({dt / iters * 1e3:.2f} ms/pass amortized)")
    return rate


def main():
    print("backend:", jax.default_backend(), jax.devices())
    ok = check_kernel_equality()
    ok &= check_packed_labels()
    ok &= check_agc_kernel_gains()
    ok &= check_rx_stream_equality()
    bench_dd_throughput("qpsk")
    bench_dd_throughput("8psk")
    bench_dd_throughput("16qam")
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
