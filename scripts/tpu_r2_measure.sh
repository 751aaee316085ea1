#!/bin/bash
# Round-2 second-half hardware A/B runbook. Run when the TPU tunnel is
# back; ONE TPU job at a time (the tunnel serializes). Logs to
# /tmp/r2_measure/. Each bench prints one JSON line; train benches
# print ms/step.
set -u
OUT=/tmp/r2_measure
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# --- eval bench A/Bs (judged metric) ---
run bench_base      1800 python bench.py
run bench_x640      3000 env TRIAD_BENCH_WAVE=x640 python bench.py
run bench_posconv   3000 env TRIAD_BENCH_POSCONV=pallas python bench.py
run bench_both      3000 env TRIAD_BENCH_WAVE=x640 TRIAD_BENCH_POSCONV=pallas python bench.py
run bench_vitpk     3000 env TRIAD_BENCH_VIT_ATTN=packed python bench.py
run bench_mqkv      3000 env TRIAD_BENCH_HUBERT_ATTN=packed_merged python bench.py
run bench_vitmq     3000 env TRIAD_BENCH_VIT_ATTN=packed_merged python bench.py
run bench_bf16w     3000 env TRIAD_BENCH_PARAM_DTYPE=bfloat16 python bench.py
# all likely eval winners composed (drop losers at codification time)
run bench_combo     3000 env TRIAD_BENCH_WAVE=x640 TRIAD_BENCH_POSCONV=pallas TRIAD_BENCH_HUBERT_ATTN=packed_merged TRIAD_BENCH_VIT_ATTN=packed_merged TRIAD_BENCH_PARAM_DTYPE=bfloat16 python bench.py
# scored-separately int8 serving mode (NOT the judged bf16 number)
run bench_int8      3000 env TRIAD_BENCH_QUANT=int8 python bench.py
# repeat base to bound tunnel drift
run bench_base2     1800 python bench.py

# --- train step A/Bs ---
# tpu_train_bench argv: [iters] [loss_impl] [moments_dtype] [knobs]
run train_perf          2400 python scripts/tpu_train_bench.py 10 chunked float32 perf
run train_posconv       3600 python scripts/tpu_train_bench.py 10 chunked float32 perf,posconv
run train_posconv_w640  3600 python scripts/tpu_train_bench.py 10 chunked float32 perf,posconv,wave640
run train_lossvjp       3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf
run train_all           3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv,wave640
run train_mqkv          3600 python scripts/tpu_train_bench.py 10 chunked float32 perf,mqkv
run train_vitmq         3600 python scripts/tpu_train_bench.py 10 chunked float32 perf,vitmq
# everything composed (drop losers at codification time)
run train_all2          3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv,wave640,mqkv,vitmq

# --- correctness on the real PRNG (interpret mode cannot cover) ---
run attn_check         2400 python scripts/tpu_attention_check.py

# --- xplane traces for win attribution (ground truth vs scan timing) ---
run trace_eval         2400 python scripts/tpu_profile_trace.py eval "$OUT/xplane_eval"
run trace_train        3600 env TRIAD_TRAIN_KNOBS=perf,posconv,wave640,mqkv,vitmq python scripts/tpu_profile_trace.py train "$OUT/xplane_train"

# --- host->device ingest with the wire-dtype packed path ---
run ingest_packed      1800 python scripts/data_throughput.py packed 4 thread
run ingest_packed_daug 1800 python scripts/data_throughput.py packed 4 thread device_augment

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -2 "$f"; done
