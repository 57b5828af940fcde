#!/bin/bash
# Round-5 load-bearing serve bench (VERDICT r04 item 3): >=500 requests /
# >=60 s wall per mode, TWO process-level repetitions per mode interleaved
# in time (A B A B) so a day-swing shows up INSIDE one artifact, plus
# in-process --reps 2 for short-horizon spread. Appends one JSON line per
# run to BENCH_SERVE_r05.jsonl; summarize with summarize_serve_r05.py.
#
# Detached TPU usage: nohup bash scripts/run_bench_serve_r05.sh \
#     > /tmp/bench_serve_r05.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=BENCH_SERVE_r05.jsonl
: > "$OUT"
COMMON="--clients 4 --requests 500 --reps 2 --max_batch 8 --out $OUT"

for pass in 1 2; do
  echo "=== pass $pass: bf16 base config ==="
  python scripts/bench_serve.py $COMMON
  echo "=== pass $pass: int8 base config ==="
  python scripts/bench_serve.py $COMMON --quant int8
done
# single interleaved passes for the non-headline modes
python scripts/bench_serve.py $COMMON --precision fp32
python scripts/bench_serve.py $COMMON -b configs/txt2audio-cfm-cfg-XL.yaml
python scripts/bench_serve.py $COMMON -b configs/txt2audio-cfm-cfg-XL.yaml --quant int8
echo "done -> $OUT"
