#!/usr/bin/env python
"""Driver benchmark entry point.

Prints ONE JSON line:
  {"metric": "rx_demod_throughput", "value": <samples/s>, "unit":
   "samples/s", "vs_baseline": <value / (12.5e6 * ndevices)>}

Baseline: the BASELINE.md target is >=100 Msamples/s aggregate RRC+demod on
a v5e-8, i.e. 12.5 Msamples/s per chip; vs_baseline == 1.0 means on-target
for the attached chip count.
"""

import json
import os
import sys

# Remote TPU compiles take minutes; persist them so repeated bench runs
# (and the driver's) hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from qpsk_tpu.benchmarks import rx_throughput

    r = rx_throughput()
    print(json.dumps({k: r[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
