"""Hardware validation of the fused Pallas LDPC kernel (real TPU).

Runs the kernel against the XLA twin on the chip: decoded-bit agreement
on noisy codewords (both lowerings feed the MXU the same bf16-truncated
operands; summation orders differ, so the gate asserts >=99.9% agreement
— measured 100% — rather than strict equality) and round-trip FER.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_ldpc_tpu.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu.ops.pallas.ldpc_kernel import ldpc_decode_pallas
from qpsk_tpu.packet.ldpc import LdpcCode, ldpc_decode, ldpc_encode


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(1)
    ok = True
    for k, b, sigma in ((256, 512, 0.71), (128, 96, 0.55)):
        code = LdpcCode(k=k)
        u = jnp.asarray(rng.integers(0, 2, (b, k), dtype=np.int64))
        x = 1.0 - 2.0 * np.asarray(ldpc_encode(code, u), np.float32)
        noisy = jnp.asarray(x + rng.normal(0, sigma, x.shape)
                            .astype(np.float32))
        a = np.asarray(jax.jit(
            lambda l: ldpc_decode_pallas(code, l))(noisy))
        s = np.asarray(jax.jit(
            lambda l: ldpc_decode(code, l, impl="xla"))(noisy))
        agree = (a == s).mean()
        fer = 1.0 - (a == np.asarray(u)).all(axis=1).mean()
        print(f"k={k} b={b}: bit_agreement={agree:.6f} fer={fer:.4f}")
        ok &= agree >= 0.999
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
