#!/bin/bash
# Round-3 close-out TPU queue (one chip, one CPU core -> strictly
# sequential, each stage bounded):
#   1. wait for the in-flight serve-bench pass 1 (it warms every bucket's
#      compile cache as a side effect, but its measured numbers are poisoned
#      by cold mid-bucket compiles)
#   2. re-run the 4-mode serve bench with the all-buckets warmup fix ->
#      clean BENCH_SERVE_r03.json (VERDICT item 8)
#   3. int8-variant precision drift sweep (VERDICT item 6 evidence)
#   4. TRAIN_r05 rung: XL train step at b28 lite+factored+cached (OOM'd by
#      37 MB under AdamW fp32 nu; first attempt since factored freed 3 GB)
set -u
cd "$(dirname "$0")/.."

SERVE_PID="${1:-}"
if [ -n "$SERVE_PID" ]; then
    while kill -0 "$SERVE_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== serve bench pass 2 (warm cache, fixed warmup) ===" >&2
bash scripts/run_bench_serve_r03.sh > /tmp/bench_serve_r03b.log 2>&1
echo "serve pass2 rc=$?" >&2

echo "=== drift sweep (int8 variants) ===" >&2
timeout 2400 python scripts/measure_precision_drift.py \
    > /tmp/drift_r03.log 2>&1
echo "drift rc=$?" >&2

echo "=== train step b28 lite+factored+cached ===" >&2
timeout 1500 python scripts/bench_train_step.py --batch 28 \
    --remat_policy save_gemms_lite --mu_dtype bfloat16 \
    --factored --cached_latents > /tmp/train_b28.log 2>&1
echo "train b28 rc=$?" >&2
echo "=== queue done ===" >&2
