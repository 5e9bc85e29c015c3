"""Same-process interleaved A/B of the front-end FIR contraction variants:
(cw, stack, fuse_planes).  Decision metric is the composed-path
rx_throughput at the 8192x8 headline operating point (the FE-only bench
at 2048x16 showed >2x relay noise in round-5 measurement and is not
trustworthy for deltas).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_fe_cw.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from qpsk_tpu import benchmarks
from qpsk_tpu.ops.pallas import frontend_kernel as fk

assert jax.devices()[0].platform == "tpu", jax.devices()

VARIANTS = [
    # (cw, stack, fuse)
    (256, False, False),   # round-4 baseline shape (shared table)
    (256, False, True),    # halve dot count via plane fusion
    (128, True, True),     # zero-minimal MACs, one dot per block
    (128, True, False),
    (128, False, True),
]

results = []
for rnd in range(3):
    for cw, stack, fuse in VARIANTS:
        fk._CW_PREF, fk._STACK, fk._FUSE = cw, stack, fuse
        rx = benchmarks.rx_throughput()
        rec = {"round": rnd, "cw": cw, "stack": stack, "fuse": fuse,
               "rx_gsps": round(rx["value"] / 1e9, 2)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

for cw, stack, fuse in VARIANTS:
    rows = [r["rx_gsps"] for r in results
            if (r["cw"], r["stack"], r["fuse"]) == (cw, stack, fuse)]
    print(f"cw={cw} stack={int(stack)} fuse={int(fuse)}: "
          f"rx {min(rows)}-{max(rows)}")
