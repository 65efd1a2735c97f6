#!/bin/bash
# Round-5 TPU job queue: runs everything chip-bound in priority order the
# moment the tunneled backend recovers, each stage under the stall watchdog.
#   1. quality_e2e overfit (recreates runs/quality_e2e for bench_scene +
#      a fresh QUALITY_E2E artifact)
#   2. col_shift band sweep (the K-fill geometry measurement)
#   3. the three scene-scaling arms (32 / 96 / 96+flip)
# The final quality push is launched manually after reading the arm results.
set -u
cd "$(dirname "$0")/.."
WD="python scripts/tpu_watchdog.py"

echo "=== stage 1: quality_e2e ($(date)) ==="
$WD --progress runs/quality_e2e/logs/metrics.jsonl --init_stall 1500 \
    --stall 1500 --retries 12 --sleep 90 -- \
    python scripts/quality_overfit.py --use_unet --datasetdir .fixture_data \
    --steps 3000 --resume_last --out QUALITY_E2E_r5.json \
  || { echo "=== stage 1 FAILED ==="; exit 1; }

echo "=== stage 2: col_shift band sweep ($(date)) ==="
# chip is demonstrably healthy here; plain timeout suffices (the sweep's
# compiles are kernel-level and cached across the two invocations)
timeout 1800 python scripts/bands_sweep.py --n 262144 --bands 3,5,8,16 \
    > BANDS_SWEEP_PLAIN_r5.json 2>/tmp/bands_plain.log \
  || echo "=== plain sweep failed (continuing) ==="
timeout 1800 python scripts/bands_sweep.py --n 262144 --bands 3,5,8 \
    --col_shift > BANDS_SWEEP_COLSHIFT_r5.json 2>/tmp/bands_cs.log \
  || echo "=== col_shift sweep failed (continuing) ==="

echo "=== stage 3: scaling arms ($(date)) ==="
bash scripts/run_scaling_arms.sh || { echo "=== arms FAILED ==="; exit 1; }
echo "=== queue done ($(date)) ==="
