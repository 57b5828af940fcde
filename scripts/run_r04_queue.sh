#!/bin/bash
# Round-4 TPU measurement queue (one chip, one CPU core -> strictly
# sequential, each stage bounded):
#   1. flash-train probe at seq 1248/2048 with the maskless fused backward
#      (VERDICT item 6: make flash win at the collate cap)
#   2. train-MFU rungs (VERDICT item 4): save_gemms (full) at b24 now that
#      factored nu freed ~3 GB; flash forced ON at production seq; the
#      seq-1248 XL e2e A/B (b6 x 1248 tokens ~= b24 x 312)
#   3. train decompose with the production factored optimizer (refreshes
#      the ~31 ms optimizer-phase number measured under fp32 nu)
#   4. precision-drift sweep: int8 baseline vs SmoothQuant variants
#      (VERDICT item 3 -> DRIFT_R04)
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1

echo "=== flash train 1248 (maskless fused bwd) ===" >&2
timeout 1200 python scripts/probe_flash_train.py --seq 1248 \
    > /tmp/pft_1248.log 2>&1
echo "pft1248 rc=$?" >&2
timeout 1200 python scripts/probe_flash_train.py --seq 2048 \
    > /tmp/pft_2048.log 2>&1
echo "pft2048 rc=$?" >&2
timeout 1200 python scripts/probe_flash_train.py --seq 624 \
    > /tmp/pft_624.log 2>&1
echo "pft624 rc=$?" >&2

echo "=== train b24 save_gemms (full) ===" >&2
timeout 1500 python scripts/bench_train_step.py --batch 24 \
    --remat_policy save_gemms --mu_dtype bfloat16 \
    --factored --cached_latents > /tmp/train_sg_b24.log 2>&1
echo "train sg rc=$?" >&2

echo "=== train b24 lite + flash ON ===" >&2
timeout 1500 python scripts/bench_train_step.py --batch 24 \
    --remat_policy save_gemms_lite --mu_dtype bfloat16 \
    --factored --cached_latents --use_flash on \
    > /tmp/train_lite_flash_b24.log 2>&1
echo "train lite+flash rc=$?" >&2

echo "=== XL e2e seq-1248 A/B (b6) ===" >&2
timeout 1500 python scripts/bench_train_step.py --batch 6 --latent 1248 \
    --remat_policy save_gemms_lite --mu_dtype bfloat16 \
    --factored --cached_latents --use_flash on \
    > /tmp/train_1248_flash.log 2>&1
echo "train1248 flash rc=$?" >&2
timeout 1500 python scripts/bench_train_step.py --batch 6 --latent 1248 \
    --remat_policy save_gemms_lite --mu_dtype bfloat16 \
    --factored --cached_latents --use_flash off \
    > /tmp/train_1248_dense.log 2>&1
echo "train1248 dense rc=$?" >&2

echo "=== train decompose (factored optimizer) ===" >&2
timeout 1500 python scripts/probe_train_decompose.py \
    > /tmp/train_decompose_r04.log 2>&1
echo "decompose rc=$?" >&2

echo "=== drift sweep (int8 + smooth variants) ===" >&2
timeout 2400 python scripts/measure_precision_drift.py \
    "--modes=int8+,smooth" > /tmp/drift_r04.log 2>&1
echo "drift rc=$?" >&2
echo "=== queue done ===" >&2
