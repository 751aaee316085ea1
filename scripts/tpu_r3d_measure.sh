#!/bin/bash
# Round-3 fourth hardware runbook: close the eval gap from the r3c
# winners (xt+unroll = 616.1, mr4/pbf16 retired) with the legs the
# mid-run r3c edit skipped (frontend tb sweep) plus the fused-LN eval
# A/B, then the final composed measurements that get codified.
set -u
OUT=/tmp/r3d
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# --- frontend block-size sweep on the xt+unroll winner base ---
run bench_tb128     3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled TRIAD_BENCH_FE_TB=128 python bench.py
run bench_tb256     3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled TRIAD_BENCH_FE_TB=256 python bench.py

# --- fused add+LN at eval on the winner base ---
run bench_lnfused   3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled TRIAD_BENCH_LN=fused python bench.py

# --- ragged-N eval attention (kills the 4.8 ms of jnp.pad copies;
# first on-chip compile of ragged token dims in these kernels) ---
run bench_attnpad   3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled TRIAD_BENCH_ATTN_PAD=none python bench.py

# --- final eval combo (winners only; extend with tb/ln if they win) ---
run bench_winners   3000 env TRIAD_BENCH_WAVE=xt TRIAD_BENCH_LOSS=chunked_unrolled python bench.py

# --- train composed winners: posconv+wavext + bf16 moments ---
run train_winners   4200 python scripts/tpu_train_bench.py 10 chunked_vjp bfloat16 perf,posconv,wavext

# --- north-star step: composed global-512 loss on the winner config ---
run g512_winners    5400 python scripts/loss_global512_ab.py 5 chunked,chunked_unrolled composed

# --- fresh winners trace (replaces the mr4-tainted r3c trace leg) ---
run trace_winners   3600 env TRIAD_EVAL_WAVE=xt TRIAD_EVAL_LOSS=chunked_unrolled python scripts/tpu_profile_trace.py eval /tmp/r3d/xplane_eval

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
