#!/bin/bash
# Round-4 TPU measurement campaign — ONE process at a time on the chip.
# Usage: bash tools/run_tpu_campaign_r4.sh
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

# 1. generic-family end-to-end after packed labels + tm AGC (the VERDICT
#    "within ~15% of QPSK" target), plus the QPSK headline with its new
#    roofline record
timeout 3600 python -m qpsk_tpu bench --suite modfam | tee /tmp/r4_modfam.jsonl
timeout 3600 python -m qpsk_tpu bench --suite rx | tee /tmp/r4_rx.jsonl

# 2. 8192-channel attribution probes: aggregate + each kernel standalone
timeout 5400 python - <<'EOF' | tee /tmp/r4_8192.jsonl
import json
from qpsk_tpu import benchmarks as B
for ch in (4096, 8192):
    print(json.dumps(B.rx_throughput(channels=ch)), flush=True)
    print(json.dumps(B.frontend_throughput("pallas", channels=ch)),
          flush=True)
    print(json.dumps(B.costas_throughput("pallas", channels=ch)), flush=True)
EOF

# 3. LDPC bound record
timeout 3600 python -m qpsk_tpu bench --suite fec | tee /tmp/r4_fec.jsonl
