#!/bin/bash
# Round-3 fifth hardware runbook: the legs r3c skipped (its mid-run
# edit shifted bash's read offset) + the fixed mlp_check.
set -u
OUT=/tmp/r3e
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# ingest e2e with device augmentation (VERDICT r2 item 7 re-measure)
run ingest_devaug   3600 python scripts/ingest_train_e2e.py 100 8
# host-augment control on the same code path
run ingest_hostaug  3600 env TRIAD_INGEST_HOSTAUG=1 python scripts/ingest_train_e2e.py 60 8
# fixed mlp_check (f32 rb=2 leg at shorter T)
run mlp_check       3600 python scripts/tpu_mlp_check.py

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
