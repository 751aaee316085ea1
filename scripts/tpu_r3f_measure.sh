#!/bin/bash
# Round-3 sixth hardware runbook: the codified-default measurements.
# perf_eval now carries xt + ragged-N attention + unrolled loss;
# perf_train carries posconv + xt. Logs to /tmp/r3f/.
set -u
OUT=/tmp/r3f
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $(tail -1 "$OUT/$name.log")"
}

# on-chip numerics for the CODIFIED xt frontend: the original r3b
# check crashed at the Mosaic alignment bug BEFORE comparing values;
# after the fix only throughput was ever measured on hardware. The
# r3e ingest run ended with loss=NaN — rule the xt fwd values in/out.
run frontend_check  3600 python scripts/tpu_r3_kernels_check.py frontend

# on-chip numerics: ragged vs padded attention (eval + train kernels)
run attnpad_check   3600 python scripts/tpu_attnpad_check.py

# THE judged program with the codified defaults (also warms the
# persistent compile cache for the driver's round-end bench run)
run bench_codified  3000 python bench.py
run bench_codified2 1800 python bench.py

# fused add+LN with row merging (rb=1 lost to grid bubbles at 611.2;
# rb=8 cuts grid steps 8x with negligible VMEM)
run bench_lnrows8   3000 env TRIAD_BENCH_LN=fused TRIAD_BENCH_LN_ROWS=8 python bench.py

# train attnpad A/B on the codified train winners (perf now includes
# posconv + wavext; attnpad kills the pad copies around fwd AND bwd)
run train_attnpad   4200 python scripts/tpu_train_bench.py 10 chunked_vjp float32 perf,attnpad

# global-512 composed step with the codified eval config (its "check"
# value doubles as an on-chip xt-forward correctness probe: pre-xt runs
# printed 728.83-728.85)
run g512_codified   5400 python scripts/loss_global512_ab.py 5 chunked_unrolled composed

# longer-horizon loss sanity on the codified train set (the r3e ingest
# run ended loss=NaN after 100 steps; 30 chained updates here)
run train_loss30    4200 python scripts/tpu_train_bench.py 30 chunked_vjp float32 perf

# fresh fat map at the codified defaults (perf_eval == judged program)
run trace_codified  3600 python scripts/tpu_profile_trace.py eval /tmp/r3f/xplane_eval

echo "=== summary ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -1 "$f"; done
