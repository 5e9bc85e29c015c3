"""Interleaved same-process A/B: AGC power emission in lane 1 of the idx
plane vs a dedicated output plane (frontend_kernel._PW_LANE).  Throughput
only — run tools/check_tm_tpu.py separately for the bit-exactness gate
of whichever variant is the default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_fe_pwlane.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from qpsk_tpu import benchmarks
from qpsk_tpu.config import ModemConfig
from qpsk_tpu.ops.pallas import frontend_kernel as fk

assert jax.devices()[0].platform == "tpu", jax.devices()

CFGS = [("qpsk+agc", ModemConfig(agc=True)),
        ("16qam+agc", ModemConfig(modulation="16qam", agc=True))]
results = []
for rnd in range(3):
    for lane in (True, False):
        fk._PW_LANE = lane
        fk._frontend_2d_tm.clear_cache()
        for name, cfg in CFGS:
            r = benchmarks.rx_throughput(cfg=cfg)
            rec = {"round": rnd, "pw_lane": lane, "mod": name,
                   "rx_gsps": round(r["value"] / 1e9, 2)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

for lane in (True, False):
    for name, _ in CFGS:
        rows = [r["rx_gsps"] for r in results
                if r["pw_lane"] == lane and r["mod"] == name]
        print(f"pw_lane={int(lane)} {name}: {min(rows)}-{max(rows)}")
