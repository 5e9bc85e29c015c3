#!/bin/bash
# Round-5 TPU measurement campaign — ONE process at a time on the chip.
# Regenerates the fresh-process bench suite artifact (now including the
# composed coded-RX rows, the costas serial-step-floor record, and the
# FDM decomposition record) and re-runs every hardware bit-exactness
# gate on the final tree.
# Usage: bash tools/run_tpu_campaign_r5.sh
# -e/-o pipefail: a failed or timed-out bench must NOT overwrite the
# committed artifact through the tee, and a failing hardware gate must
# fail the campaign (tail in the gate pipelines would otherwise swallow
# the exit status).
set -exo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

# 1. the full fresh-process suite -> the committed artifact
timeout 10800 python -m qpsk_tpu bench --suite all \
    | tee /tmp/r5_suite.jsonl && cp /tmp/r5_suite.jsonl docs/bench_suite_v5e.jsonl

# 1b. the frontend roofline artifact (fresh process)
timeout 3600 python -m qpsk_tpu bench --suite frontend \
    | tee /tmp/r5_frontend.jsonl && cp /tmp/r5_frontend.jsonl docs/frontend_roofline.jsonl

# 2. hardware bit-exactness gates on the final state
for gate in check_frontend_tpu check_tm_tpu check_dd_tpu check_gear_tpu \
            check_viterbi_tpu check_ldpc_tpu check_single_stream_tpu; do
  timeout 3600 python tools/$gate.py | tail -2
done
