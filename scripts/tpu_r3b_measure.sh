#!/bin/bash
# Round-3 second hardware runbook: now that pallas_posconv compiles on
# the chip (128-aligned dynamic_rotate buffers) and the vitmq winner is
# the default, measure the remaining eval/train knob set and settle the
# open VERDICT r2 items. ONE TPU job at a time. Logs to /tmp/r3b/.
set -u
OUT=/tmp/r3b
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# --- eval: defaults (vitmq codified), then posconv / xt singles + combo ---
run bench_default   3000 python bench.py
run bench_posconv   3000 env TRIAD_BENCH_POSCONV=pallas python bench.py
run bench_xt        3000 env TRIAD_BENCH_WAVE=xt python bench.py
run bench_combo     3000 env TRIAD_BENCH_POSCONV=pallas TRIAD_BENCH_WAVE=xt python bench.py
run bench_unroll    3000 env TRIAD_BENCH_LOSS=chunked_unrolled python bench.py

# --- train: posconv + xt on top of the chunked_vjp winner ---
run train_base      3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf
run train_posconv   3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv
run train_combo     3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv,wavext
# loss=pallas at train (isolated 64x64 fwd+bwd: 21.1 vs 65.6 ms)
run train_pallas    3600 python scripts/tpu_train_bench.py 10 pallas float32 perf,posconv
# bf16 Adam moments
run train_bf16mom   3600 python scripts/tpu_train_bench.py 10 chunked_vjp bfloat16 perf,posconv

# --- VERDICT r2 item 8: composed loss A/B at the global-512 point ---
run loss_g512_comp  5400 python scripts/loss_global512_ab.py 5 chunked,pallas composed

# --- dropout-replay check (mask-extraction rewrite of check 5) ---
run attn_check      3000 python scripts/tpu_attention_check.py

# --- VERDICT r2 item 7: packed loader feeding the real train step ---
run ingest_e2e      3600 python scripts/ingest_train_e2e.py 100 8

# --- repeat default to bound drift ---
run bench_default2  1800 python bench.py

# --- fresh eval trace with the round-3 winners for the next fat hunt ---
run trace_eval      3600 env TRIAD_EVAL_POSCONV=pallas TRIAD_EVAL_WAVE=xt python scripts/tpu_profile_trace.py eval /tmp/r3b/xplane_eval

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
