"""Same-process interleaved A/B of the FE kernel's rot-fold (the
(CT,1)-width pick-phasor rotation accumulation vs the full-plane one).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_fe_fold.py
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

results = []
for rnd in range(3):
    for fold in (True, False):
        fk._FOLD_ROT = fold
        # _FOLD_ROT is read at trace time, not a jit static arg — clear
        # the launch wrappers' caches so the flip actually recompiles
        fk._frontend_2d.clear_cache()
        fk._frontend_2d_tm.clear_cache()
        rx = benchmarks.rx_throughput()
        rec = {"round": rnd, "fold": fold,
               "rx_gsps": round(rx["value"] / 1e9, 2)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

for fold in (True, False):
    rows = [r["rx_gsps"] for r in results if r["fold"] == fold]
    print(f"fold={int(fold)}: rx {min(rows)}-{max(rows)}")
