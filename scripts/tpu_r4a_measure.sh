#!/bin/bash
# Round-4 first hardware runbook (VERDICT r3 items 1, 2, 4):
#   - the queued merged-train ragged forensics (attnpad check 2) and the
#     mqkv-control ingest leg that settle the r3g NaN;
#   - the full wire-dtype ingest e2e (AV devaug + TV devaug, file-backed
#     captions) that r3i never ran;
#   - the DP-512 composed baseline at the codified config (chunk 32),
#     re-measured at iters=5 (comparable to the r3h 102.69 ms) AND
#     iters=10 (the repo's own methodology: iters=5 chained probes carry
#     ~RTT/5 inflation; docs/TRAINING_PERF.md round-1 continuation), plus
#     a chunk-48 sweep point r3h skipped;
#   - the judged-shape bench for today's drift calibration.
set -u
OUT=/tmp/r4a
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# 1) merged-TRAIN ragged forensics (the r3g NaN suspect) + re-verify the
#    production ragged paths after the adapter restriction (9065abe)
run attnpad_check2  3600 python scripts/tpu_attnpad_check.py

# 2) full wire-dtype ingest (AV devaug + TV devaug w/ file captions)
run ingest_full_devaug 3600 python scripts/ingest_train_e2e.py 60 8
# 3) control: same run with the r3g knobs (mqkv/vitmq) now that the
#    merged adapter falls back to padded shapes at train — if this is
#    clean, the ragged merged-train kernel was the NaN; if it still
#    NaNs, keep digging
run ingest_mqkv_ctl 3600 python scripts/ingest_train_e2e.py 60 8 perf,mqkv,vitmq

# 4) DP-512 composed: today's baseline at the codified chunk 32
#    (iters=5 == r3h methodology, then iters=10) + the chunk-48 point
run dp512_c32_i5  5400 python scripts/loss_global512_ab.py 5 chunked_unrolled composed 32
run dp512_c32_i10 5400 python scripts/loss_global512_ab.py 10 chunked_unrolled composed 32
run dp512_c48_i10 5400 python scripts/loss_global512_ab.py 10 chunked_unrolled composed 48

# 5) judged-shape bench (drift calibration for everything above)
run bench_default 3000 python bench.py

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
