#!/bin/bash
# Round-4 perf runbook (after r4b): the DP-512 attack surface + the
# train-step story (VERDICT r3 items 1 and 5).
#   - DP-512 chunk sweep around the codified 32 (r3h measured 102.69 at
#     32 vs 103.62 at 64 / 104.18 at 8 / 104.94 at 16; 24/40/48 unswept);
#   - the dp512 xplane trace (where do the 102.69 ms go?);
#   - train A/B: perf vs perf,mqkv now that the merged-train ragged
#     kernel is cleared bit-exact (0dfeed7) — the r2 mqkv verdict
#     (458.2, within drift) predates ragged-N;
#   - a fresh train trace at the codified 442.6 config for the roofline
#     accounting table.
set -u
OUT=/tmp/r4c
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# 0) the audio-NaN module probe: perf vs parity kernels on the saved
#    culprit batch (uniform-noise audio NaNs the audio encoder at
#    step 0 on-chip; grounded tonal audio and gaussian noise are clean)
run nan_probe_perf   3000 python scripts/tpu_nan_audio_probe.py perf
run nan_probe_parity 3000 python scripts/tpu_nan_audio_probe.py -
run nan_probe_eval   3000 python scripts/tpu_nan_audio_probe.py perf /tmp/nan_culprit.npz eval

# 0b) bf16 token-sim volume A/B (volume_dtype knob, commit r4)
run bench_vdt        3000 env TRIAD_BENCH_VOLUME_DTYPE=bfloat16 python bench.py
run dp512_vdt        3000 env TRIAD_BENCH_VOLUME_DTYPE=bfloat16 python bench.py --dp512

for c in 24 40 48 64; do
  run "dp512_c$c" 3000 env TRIAD_BENCH_LOSS_CHUNK=$c python bench.py --dp512
done

run trace_dp512 3000 python scripts/tpu_profile_trace.py dp512 /tmp/triad_trace_dp512

run train_perf 4000 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf
run train_mqkv 4000 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,mqkv

run trace_train 4000 env TRIAD_TRAIN_KNOBS=perf python scripts/tpu_profile_trace.py train /tmp/triad_trace_train

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
