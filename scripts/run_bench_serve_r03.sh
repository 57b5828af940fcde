#!/bin/bash
# BENCH_SERVE_r03: per-mode serving latency under concurrent clients
# (VERDICT round-2 item 8). One bench_serve process per mode, sequential —
# the box has one chip and one CPU core. Appends one JSON line per mode.
# Usage: bash scripts/run_bench_serve_r03.sh [out_file] [int8_variant]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_SERVE_r03.json}"
INT8="${2:-int8}"
: > "$OUT"
COMMON="--clients 4 --requests 32 --max_batch 8 --out $OUT"
for mode in "--precision bf16" "--precision bf16 --quant $INT8" \
            "--precision fp32" "--precision fp32_highest"; do
    echo "=== bench_serve $mode ===" >&2
    timeout 3000 python scripts/bench_serve.py $COMMON $mode \
        || echo "{\"mode\": \"$mode\", \"error\": \"rc=$?\"}" >> "$OUT"
done
echo "=== done ===" >&2
cat "$OUT"
