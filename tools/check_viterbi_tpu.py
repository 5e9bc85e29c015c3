"""Hardware validation of the fused Pallas Viterbi kernels (real TPU).

Round-1 lesson (CLAUDE.md): interpret mode is not sufficient evidence for
a Pallas kernel — Mosaic lowering can round/compare differently.  This
script runs the kernel pair against the lax.scan twin on the chip:
soft-LLR decode equality, hard-LLR (all-ties) decode equality, and a
round-trip decode through noise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_viterbi_tpu.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu.ops.pallas.viterbi_kernel import viterbi_decode_pallas
from qpsk_tpu.packet.fec import (ConvCode, conv_encode, hard_llrs,
                                 viterbi_decode)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    code = ConvCode()
    rng = np.random.default_rng(1)
    ok = True
    for nbits, b, sigma in ((256, 512, 0.7), (238, 96, 0.55),
                            (100, 130, 0.4)):
        u = jnp.asarray(rng.integers(0, 2, (b, nbits), dtype=np.int64))
        c = conv_encode(code, u)
        x = 1.0 - 2.0 * np.asarray(c, np.float32)
        noisy = jnp.asarray(x + rng.normal(0, sigma, x.shape)
                            .astype(np.float32))
        a = np.asarray(jax.jit(
            lambda l, nb=nbits: viterbi_decode_pallas(code, l, nb))(noisy))
        s = np.asarray(jax.jit(
            lambda l, nb=nbits: viterbi_decode(code, l, nb,
                                               impl="scan"))(noisy))
        soft_eq = (a == s).all()
        hb = hard_llrs(jnp.asarray(
            (np.asarray(c) + (rng.random(c.shape) < 0.02)) % 2))
        ah = np.asarray(jax.jit(
            lambda l, nb=nbits: viterbi_decode_pallas(code, l, nb))(hb))
        sh = np.asarray(jax.jit(
            lambda l, nb=nbits: viterbi_decode(code, l, nb,
                                               impl="scan"))(hb))
        hard_eq = (ah == sh).all()
        clean = (a == np.asarray(u)).all(axis=1).mean()
        print(f"nbits={nbits} b={b}: soft_eq={soft_eq} hard_eq={hard_eq} "
              f"frames_clean={clean:.3f}")
        ok &= bool(soft_eq and hard_eq)
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
