#!/bin/bash
# Round-3 ninth hardware runbook: the full wire-dtype ingest (AV devaug
# + the new TV devaug with file-backed captions) feeding the production
# joint step.
set -u
OUT=/tmp/r3i
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# merged-TRAIN ragged forensics (the r3g NaN suspect) + re-verify the
# production (unmerged) ragged paths after the adapter restriction
run attnpad_check2  3600 python scripts/tpu_attnpad_check.py

run ingest_full_devaug 3600 python scripts/ingest_train_e2e.py 60 8
# control: same run with the r3g knob set (mqkv/vitmq) now that the
# merged adapter falls back to padded shapes — if this is clean, the
# ragged merged-train kernel was the NaN; if it still NaNs, keep digging
run ingest_mqkv_ctl 3600 python scripts/ingest_train_e2e.py 60 8 perf,mqkv,vitmq

# loss chunk-size at the single-chip judged shape (g512 sweep showed
# chunk 8 marginally ahead at 512 keys)
run bench_chunk8    3000 env TRIAD_BENCH_LOSS_CHUNK=8 python bench.py
run bench_chunk32   3000 env TRIAD_BENCH_LOSS_CHUNK=32 python bench.py

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
