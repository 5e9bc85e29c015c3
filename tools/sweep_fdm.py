"""FDM operating-point sweep (same-process, interleaved rounds): nslots x
frames, wideband GS/s with the decomposition record — the working-set
analysis that found the modem's 8192x8 point, applied to the wideband
receiver (VERDICT r4 #6).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_fdm.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from qpsk_tpu import benchmarks

assert jax.devices()[0].platform == "tpu", jax.devices()

POINTS = [(256, 16), (256, 32), (512, 16), (512, 8), (1024, 8)]
results = []
for rnd in range(2):
    for nslots, frames in POINTS:
        r = benchmarks.fdm_throughput(nslots=nslots, frames=frames)
        rec = {"round": rnd, "nslots": nslots, "frames": frames,
               "wide_gsps": round(r["value"] / 1e9, 2), "fdm": r["fdm"]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

for nslots, frames in POINTS:
    rows = [r["wide_gsps"] for r in results
            if (r["nslots"], r["frames"]) == (nslots, frames)]
    print(f"nslots={nslots} frames={frames}: {min(rows)}-{max(rows)}")
