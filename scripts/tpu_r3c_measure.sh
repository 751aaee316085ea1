#!/bin/bash
# Round-3 third hardware runbook: composition legs on top of the r3b
# singles (xt +19, unroll +10, posconv -6 at eval) plus the two
# still-unmeasured knobs (param bf16 storage, fused-MLP batch-row
# merging). ONE TPU job at a time. Logs to /tmp/r3c/.
set -u
OUT=/tmp/r3c
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# --- eval compositions ---
run bench_xt_unroll 3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled python bench.py
run bench_xt_mr4    3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_MLP_ROWS=4 python bench.py
run bench_xt_pbf16  3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_PARAM_DTYPE=bfloat16 python bench.py
run bench_full      3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled TRIAD_BENCH_MLP_ROWS=4 TRIAD_BENCH_PARAM_DTYPE=bfloat16 python bench.py
# frontend block-size sweep on the xt winner (per-step grid overhead
# vs VMEM; the 21 ms kernel is 76% MFU of the 15.9 ms conv floor)
run bench_xt_tb128  3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_FE_TB=128 python bench.py
run bench_xt_tb256  3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_FE_TB=256 python bench.py
# drift bound
run bench_default3  1800 python bench.py

# --- train: mlprows2 on top of the r3b winners (read r3b first) ---
run train_mr2       3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,mlprows2
# merged-qkv training attention (eval variant won; train never measured)
run train_mqkv      3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,mqkv,vitmq
# remat-policy A/Bs on the r3b winner base (never hardware-measured):
# noremat trades ~16 ms of frontend recompute for ~10 ms of HBM
# round-trip on the stored activations (may OOM — that IS the result);
# rematconv recomputes the frontend once, unchunked.
run train_noremat   3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv,wavext,noremat
run train_rematconv 3600 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,posconv,wavext,rematconv

# --- block_rows dropout-replay + micro-bench on chip ---
run mlp_check       3600 python scripts/tpu_mlp_check.py

# --- ingest e2e RE-RUN with device augmentation (the first run's
# 22.5 clips/s wall was host numpy augmentation on this 1-core box;
# with devaug the host cost per clip is one memcpy) ---
run ingest_devaug   3600 python scripts/ingest_train_e2e.py 100 8

# --- fresh eval trace with the ACTUAL winner set (r3b's trace_eval
# includes posconv=pallas, which measured -6 clips in-program) ---
run trace_winners   3600 env TRIAD_EVAL_WAVE=xt TRIAD_EVAL_LOSS=chunked_unrolled TRIAD_EVAL_MLP_ROWS=4 python scripts/tpu_profile_trace.py eval /tmp/r3c/xplane_eval

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
