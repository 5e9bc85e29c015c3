"""Hardware validation of the gear-shift Costas kernel (run on real TPU).

Round-1 lesson (CLAUDE.md): interpret mode is not sufficient evidence for a
Pallas kernel — Mosaic lowering can round differently (the MXU bf16
truncation bug was invisible in interpret).  This script runs the gear-mode
Pallas kernel against the lax.scan twin on the actual chip and reports
bit-exactness of every state plane plus the gear engagement rate.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_gear_tpu.py
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu.ops import costas, modmap
from qpsk_tpu.ops.cplx import CF32, from_complex, to_complex
from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas_traced

TAU = 2.0 * math.pi


def main():
    print("backend:", jax.default_backend(), jax.devices())
    c, t = 256, 512
    rng = np.random.default_rng(5)
    offset = TAU * 50.0 / 2400.0
    bits = rng.integers(0, 2, size=(c, 2 * t)).astype(np.int32)
    syms = to_complex(modmap.bits_to_symbols(jnp.asarray(bits)))
    rot = (syms * np.exp(1j * offset * np.arange(t))).astype(np.complex64)
    rot += (0.2 * (rng.standard_normal((c, t))
                   + 1j * rng.standard_normal((c, t)))).astype(np.complex64)
    z = from_complex(rot)
    p = costas.costas_params(TAU / 100.0)
    g = costas.costas_gear(TAU / 200.0)
    st0 = costas.costas_init((c,), gear=True)

    st_ref, out_ref, ft_ref = jax.jit(
        lambda s, zz: costas.costas_run_gear_traced(s, zz, p, g))(st0, z)
    st_p, out_p, ft_p = costas_run_pallas_traced(st0, z, p, gear=g)

    checks = {
        "out.re": (out_ref.re, out_p.re),
        "out.im": (out_ref.im, out_p.im),
        "freq_trace": (ft_ref, ft_p),
        "phase": (st_ref.phase, st_p.phase),
        "freq": (st_ref.freq, st_p.freq),
        "lev": (st_ref.lev, st_p.lev),
        "locked": (st_ref.locked, st_p.locked),
    }
    ok = True
    for name, (a, b) in checks.items():
        a, b = np.asarray(a), np.asarray(b)
        n = int((a != b).sum())
        if n:
            ok = False
            print(f"  {name}: {n} mismatches, max |d| = "
                  f"{np.abs(a - b).max():.3e}")
        else:
            print(f"  {name}: bit-exact")
    locked = np.asarray(st_ref.locked)
    print(f"gear engaged: {locked.mean() * 100:.1f}% of channels")
    print("RESULT:", "PASS" if ok and locked.mean() > 0.9 else "FAIL")


if __name__ == "__main__":
    main()
