#!/bin/bash
# Round-4/5 NaN kernel discrimination: the culprit-batch NaN reproduces
# at EVAL mode (forward kernels, no dropout), same 2/64 rows, parity
# clean, and does NOT reproduce when the 2 rows run alone (B=2) — so
# it is value- AND batch-layout-dependent in ONE of the perf forward
# kernels. One leg per kernel knob, same batch, eval mode.
set -u
OUT=/tmp/r4e
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(grep -o '{\"metric\": \"audio rows non-finite.*' "$OUT/$name.log" | tail -1)"
}

NPZ=/tmp/nan_culprit.npz
if [ ! -f "$NPZ" ]; then NPZ=docs/evidence/nan_culprit_audio_rows.npz; fi

run probe_fe_xt    3000 python scripts/tpu_nan_audio_probe.py monofe,wavext "$NPZ" eval skip
run probe_fe_x10   3000 python scripts/tpu_nan_audio_probe.py monofe       "$NPZ" eval skip
run probe_posconv  3000 python scripts/tpu_nan_audio_probe.py posconv      "$NPZ" eval skip
run probe_pkattn   3000 python scripts/tpu_nan_audio_probe.py pkattn       "$NPZ" eval skip
run probe_pkragged 3000 python scripts/tpu_nan_audio_probe.py pkattn,attnpad "$NPZ" eval skip
run probe_tanh     3000 python scripts/tpu_nan_audio_probe.py tanh         "$NPZ" eval skip

echo "=== summary ==="
for f in "$OUT"/*.log; do
  echo "--- $f"; grep -o '{"metric": "audio rows non-finite.*' "$f" | tail -1
done
