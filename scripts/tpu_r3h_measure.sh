#!/bin/bash
# Round-3 eighth hardware runbook: confirm the codified train set and
# sweep the loss chunk size at the global-512 regime (the remaining
# ~2.5 ms/step between the 609.9 clips/s/chip DP-512 composed rate and
# the 625 pro-rata).
set -u
OUT=/tmp/r3h
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# codified train set with NO extra knobs == the yaml/production config
run train_codified  4200 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf

# g512 loss chunk-size sweep on the codified eval config
run g512_chunk8     5400 python scripts/loss_global512_ab.py 5 chunked_unrolled composed 8
run g512_chunk32    5400 python scripts/loss_global512_ab.py 5 chunked_unrolled composed 32
run g512_chunk64    5400 python scripts/loss_global512_ab.py 5 chunked_unrolled composed 64

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
