#!/usr/bin/env python
"""Regenerate docs/scaling_cpu_mesh.jsonl — the weak-scaling efficiency
table (BASELINE.md >=80% multi-host target; VERDICT r1 item #5).

Runs the same harness a real multi-chip mesh would
(qpsk_tpu.benchmarks.scaling_efficiency) on the virtual 8-device CPU mesh.
Per-device compute is pinned to one thread (--xla_cpu_multi_thread_eigen)
so device counts map to physical cores; with 4 cores the 8-device points
are 2x oversubscribed (ideal ceiling 0.5) and recorded as such.

Usage: python tools/run_scaling.py [outfile]
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           "--xla_cpu_multi_thread_eigen=false")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from qpsk_tpu.benchmarks import scaling_efficiency

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "scaling_cpu_mesh.jsonl")
    ncores = os.cpu_count()
    from qpsk_tpu.benchmarks import sp_scaling_decomposition

    # dp at the usual size; sp at 64 frames/device — the decomposition
    # below shows the sp deficit is a FIXED per-launch collective cost on
    # this CPU backend, so the headline sp row measures at a block size
    # large enough to amortize it the way a production stream would
    records = scaling_efficiency(device_counts=(1, 2, 4, 8),
                                 channels_per_device=16, frames=16,
                                 iters=10, modes=("dp",))
    # sp rows x4 independent runs (VERDICT r4 #3 asks the target be
    # demonstrated across >= 4 runs, or the floor proven — the bound
    # records below do the latter when the host's noise band straddles it)
    for run in range(4):
        sp = scaling_efficiency(device_counts=(1, 2, 4, 8),
                                frames=64, iters=10, modes=("sp",))
        for r in sp:
            r["run"] = run
        records += sp
    # sp inefficiency decomposition (VERDICT r3 weak #1): full vs
    # frontend-only vs derived block-local time, two workload sizes,
    # non-oversubscribed device counts only
    records += sp_scaling_decomposition(device_counts=(1, 2, 4),
                                        frames_per_dev=(16, 64))
    # fixed per-launch collective cost + the efficiency bound it implies
    # on THIS backend, and the same bound priced for a real ICI mesh
    from qpsk_tpu.benchmarks import sp_bound_record
    records += sp_bound_record(device_counts=(1, 2, 4), frames=64)
    with open(out, "w") as f:
        for rec in records:
            rec["physical_cores"] = ncores
            rec["oversubscribed"] = rec["devices"] > ncores
            f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
