#!/usr/bin/env python
"""Regenerate docs/per_vs_snr.jsonl + docs/per_vs_snr_coded.jsonl.

Soak discipline (VERDICT r1 item #8): >=1000 packets per SNR point,
aggregated over >=3 independent seeds (payloads, noise, and channel draws
all differ per seed).  Per-point records carry the per-seed breakdown so a
non-monotone point is attributable (seed variance / a cycle slip) instead
of mysterious.

Usage: python tools/run_per_sweep.py [docs_dir]   (~30-60 min on CPU)
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

SEEDS = (0, 1, 2)
NFRAMES = 350          # packets per seed -> >=1000 per point over 3 seeds
SNRS = [3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 12.0]


def aggregate(per_seed_recs, fec: bool):
    """Combine one SNR point's records across seeds by total counts."""
    out = []
    for i in range(len(per_seed_recs[0])):
        recs = [r[i] for r in per_seed_recs]
        snr = recs[0]["snr_db"]
        npk = sum(r["packets"] for r in recs)
        nok = sum(round((1.0 - r["per"]) * r["packets"]) for r in recs)
        # ber was errs / (packets * payload_bits); reconstruct errs
        nbits = [r["packets"] * 240 for r in recs]
        errs = sum(round(r["ber"] * nb) for r, nb in zip(recs, nbits))
        agg = {
            "fec": fec,
            "snr_db": snr,
            "packets": npk,
            "per": round(1.0 - nok / npk, 5) if npk else 1.0,
            "ber": round(errs / max(sum(nbits), 1), 7) if npk else 0.5,
            "evm_rms": round(float(np.mean([r["evm_rms"] for r in recs])), 5),
            "detected_hz": round(float(np.mean([r["detected_hz"]
                                                for r in recs])), 3),
            "seeds": list(SEEDS),
            "per_seed": [{"seed": s, "packets": r["packets"],
                          "per": round(r["per"], 5),
                          "sync_score": r["sync_score"]}
                         for s, r in zip(SEEDS, recs)],
        }
        out.append(agg)
    return out


def main() -> None:
    from qpsk_tpu.config import ModemConfig
    from qpsk_tpu.eval import per_vs_snr
    from qpsk_tpu.packet import PacketConfig

    docs = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")
    cfg = ModemConfig()

    for fec, fname in ((False, "per_vs_snr.jsonl"),
                       (True, "per_vs_snr_coded.jsonl")):
        pcfg = PacketConfig(payload_bytes=30, fec=fec)
        per_seed = []
        for seed in SEEDS:
            recs = per_vs_snr(cfg, pcfg, SNRS, nframes=NFRAMES, seed=seed)
            per_seed.append(recs)
            print(f"fec={fec} seed={seed} done", file=sys.stderr, flush=True)
        path = os.path.join(docs, fname)
        with open(path, "w") as f:
            for rec in aggregate(per_seed, fec):
                f.write(json.dumps(rec) + "\n")
                print(json.dumps({k: rec[k] for k in
                                  ("fec", "snr_db", "packets", "per", "ber")}),
                      flush=True)
        print(f"wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
