#!/bin/bash
# Round-4 third hardware runbook: the fixed audio-NaN module probe
# (params as jit args — the closure-constant version exceeded the
# tunnel's remote_compile request limit) + the ingest measurements
# (VERDICT r3 item 4: full wire-dtype e2e, process-mode scaling).
set -u
OUT=/tmp/r4d
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

run nan_probe_perf   3000 python scripts/tpu_nan_audio_probe.py perf
run nan_probe_parity 3000 python scripts/tpu_nan_audio_probe.py -
run nan_probe_eval   3000 python scripts/tpu_nan_audio_probe.py perf /tmp/nan_culprit.npz eval

run ingest_full_devaug 3600 python scripts/ingest_train_e2e.py 60 8
run ingest_proc1 3600 python scripts/ingest_train_e2e.py 40 1 perf process
run ingest_proc2 3600 python scripts/ingest_train_e2e.py 40 2 perf process

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
