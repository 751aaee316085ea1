#!/bin/bash
# Round-3 seventh hardware runbook: clean ingest e2e numbers (tiny-LR
# throughput harness + loss probes) after the NaN forensics: xt fwd and
# ragged attention verified value-exact on-chip (r3f), so the r3e NaN
# was the random-noise toy objective at real LR.
set -u
OUT=/tmp/r3g
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

run ingest_devaug   3600 python scripts/ingest_train_e2e.py 60 8
run ingest_hostaug  3600 env TRIAD_INGEST_HOSTAUG=1 python scripts/ingest_train_e2e.py 40 8

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
