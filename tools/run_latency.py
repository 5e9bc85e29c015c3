#!/usr/bin/env python
"""Streaming-latency sweep -> docs/latency.jsonl.

Grid over the StreamDemodulator's latency knobs (bucket_frames,
sync_skip_frames, probe_frames) at the reference operating point
(2400 baud QPSK, +50 Hz, AWGN 10 dB), two seeds per point;
benchmarks.latency_benchmark verifies every decoded payload bit-exact, so
a row in the artifact is also a decode-success witness.

  PYTHONPATH=/root/repo python tools/run_latency.py [--out docs/latency.jsonl]
  # TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_latency.py
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/latency.jsonl")
    ap.add_argument("--buckets", default="1,2,4,8")
    ap.add_argument("--skips", default="2,4,8")
    ap.add_argument("--probes", default="4")
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--snr", type=float, default=10.0)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — env vars alone "
                         "are latched too early under the axon sitecustomize")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from qpsk_tpu.benchmarks import latency_benchmark

    rows = []
    for b in map(int, args.buckets.split(",")):
        for s in map(int, args.skips.split(",")):
            for p in map(int, args.probes.split(",")):
                for seed in range(args.seeds):
                    r = latency_benchmark(bucket_frames=b,
                                          sync_skip_frames=s,
                                          probe_frames=p, seed=seed,
                                          snr_db=args.snr)
                    r["seed"] = seed
                    rows.append(r)
                    print(json.dumps(r), flush=True)
    mode = "a" if args.append else "w"
    with open(args.out, mode) as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
