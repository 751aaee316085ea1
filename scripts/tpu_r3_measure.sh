#!/bin/bash
# Round-3 hardware runbook: re-measure the Mosaic-fixed posconv kernel,
# compose the surviving eval winners, settle the remaining VERDICT r2
# items that need the chip (global-512 loss A/B, ingest e2e), and probe
# the frontend GELU variants. ONE TPU job at a time (the tunnel
# serializes). Logs to /tmp/r3_measure/.
set -u
OUT=/tmp/r3_measure
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# --- eval A/Bs on the fixed kernel + winner composition ---
run bench_posconv2  3000 env TRIAD_BENCH_POSCONV=pallas python bench.py
run bench_combo2    3000 env TRIAD_BENCH_POSCONV=pallas TRIAD_BENCH_VIT_ATTN=packed_merged python bench.py
run bench_vitmq_only 3000 env TRIAD_BENCH_VIT_ATTN=packed_merged python bench.py

# --- frontend GELU variants (erf/tanh/tanh_native/id floor) ---
run frontend_gelu   3000 python scripts/tpu_frontend_gelu_check.py

# --- VERDICT r2 item 8: loss A/B at the global-512 design point ---
run loss_g512       3600 python scripts/loss_global512_ab.py 10

# --- VERDICT r2 item 7: ingest feeding the real train step ---
run ingest_e2e      3600 python scripts/ingest_train_e2e.py 100 8

# --- train-step A/B with the fixed posconv (if not covered by r2 runbook) ---
run train_posconv2  3600 python scripts/tpu_train_bench.py 10 chunked float32 perf,posconv

# --- repeat base to bound drift ---
run bench_base3     1800 python bench.py

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
