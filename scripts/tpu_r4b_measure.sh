#!/bin/bash
# Round-4 second hardware runbook (fresh session; /tmp from r4a is gone,
# verdicts live in commits 0dfeed7/15d828d). Priorities per VERDICT r3:
#   - today's drift calibration (judged-shape bench) + the DP-512
#     composed baseline as the new machine-readable artifact;
#   - the NaN data bisect (stage 2): the e2e ingest NaN survives both
#     kernel sets and plain-random inputs are clean, so swap the real
#     loader legs in one at a time;
#   - real-LR soak on grounded data (VERDICT item 3);
#   - 1000-way retrieval timing (VERDICT item 8).
set -u
OUT=/tmp/r4b
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# 1) drift calibration + the round's DP-512 baseline artifact
run bench_default 3000 python bench.py
run bench_dp512   3000 python bench.py --dp512

# 2) NaN data bisect: which real loader leg produces the non-finite
#    update? (rand/rand already proven clean on-chip, 15d828d)
run nan_av_only 3600 python scripts/tpu_nan_data_bisect.py real rand 8 perf
run nan_tv_only 3600 python scripts/tpu_nan_data_bisect.py rand real 8 perf

# 3) real-LR soak: production config, grounded data, OneCycle peak 1e-4
run soak_real_lr 5400 python scripts/tpu_soak_real_lr.py 500 8 64

# 4) full 1000-way retrieval timing on hardware
run retrieval_time 5400 python scripts/tpu_retrieval_time.py

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
