#!/bin/bash
# Round-5 hardware session (Aug 21) — what ran and where the logs went.
# All legs executed this round; results codified in docs/TRAINING_PERF.md
# ("Round 5" blocks). Kept as the runbook-of-record pattern (r2-r4 ditto).
set -u
cd "$(dirname "$0")/.."
echo "r4e NaN discrimination: bash scripts/tpu_r4e_measure.sh (/tmp/r4e)"
echo "  -> monofe,wavext 2/64; monofe 0/64; posconv 0/64 (culprit = xt)"
echo "mechanism probe:   python scripts/tpu_nan_fe_xt_probe.py"
echo "  -> pre-fix: xt out 2/64 NaN, xt var_min -1.17e-3 at default precision"
echo "  -> post-fix: 0/64, var_min +1.34e-3 (docs/evidence/nan_fe_xt_*.log)"
echo "full-model verify: python scripts/tpu_nan_audio_probe.py perf <npz> {train,eval} skip -> 0/64 both"
echo "scan-bf16 guard:   python scripts/tpu_scan_bf16_check.py (TPU+CPU: finite, non-zero -> guard dropped)"
echo "ingest post-fix:   python scripts/ingest_train_e2e.py 60 8 perf thread -> 107.4 finite (host_wait 1.9ms)"
echo "                   python scripts/ingest_train_e2e.py 40 2 perf process -> 105.8 finite"
echo "train trace:       TRIAD_TRAIN_KNOBS=perf TRIAD_TRAIN_LOSS=chunked_vjp python scripts/tpu_profile_trace.py train"
echo "  -> 463.1 ms device, 100%-coverage accounting table in TRAINING_PERF"
echo "train A/Bs:        python scripts/tpu_train_bench.py 5 chunked_vjp float32 perf 32 -> 447.2"
echo "  TRIAD_TRAIN_VOLUME_DTYPE=bfloat16 ... -> 441.1 (CODIFIED, v5e8_scale.yaml)"
echo "  ... perf,lorasep 32 -> 448.0/442.1 (retired neutral)"
echo "  ... perf,vitrows2 32 (bf16 vol) -> 446.9 (retired)"
echo "bench pair:        python bench.py -> 654.2; python bench.py --dp512 -> 646.9"
echo "trainer soak:      python scripts/tpu_trainer_soak.py 2400 -> ok:true (docs/evidence/trainer_soak_r5/)"
echo "multiproc smoke:   python scripts/multiproc_smoke.py x3 -> all PASSED (docs/evidence/multiproc_smoke_r5/)"
