"""One-off hardware sweep: aggregate RX throughput vs channel count.

The Costas kernel's per-step cost is loop/issue overhead, not VPU compute
(~122 ns/step at 2048 channels = one (8, 256) vreg row); wider channel
batches amortize that overhead over more lanes.  This sweep asks where the
aggregate rx_stream rate peaks on v5e.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_channels_tpu.py
"""
import json
import sys

from qpsk_tpu.benchmarks import costas_throughput, rx_throughput

for c in (2048, 4096, 8192):
    rec = rx_throughput(channels=c)
    print(json.dumps(rec), flush=True)
for c in (4096, 8192):
    rec = costas_throughput("pallas", channels=c)
    print(json.dumps(rec), flush=True)
