#!/bin/bash
# Controlled scene-scaling experiment (round-5 task 2): three arms, one
# protocol, ONE variable each — train-set size (32 vs 96) and flip_aug
# (96 vs 96+flip).  Everything else identical: val_point_iou monitor,
# 62.5 steps/scene (2000/6000/6000), val every 250 steps, batch 4, the SAME
# 8 held-out test scenes in every arm (--append_train grows the train set
# past the val/test block without touching it; scene i's content depends
# only on (seed, i)).
#
# Each TPU stage runs under scripts/tpu_watchdog.py: the tunneled backend's
# init-time hangs and mid-run worker stalls kill unattended runs otherwise
# (train retries resume from the last checkpoint via --resume_last).
#
# Usage: bash scripts/run_scaling_arms.sh [root] (default .synth_quality)
set -u
ROOT="${1:-.synth_quality}"
WD="python scripts/tpu_watchdog.py"
Q="python scripts/quality_multiscene.py --root $ROOT --n_val 8 --n_test 8 \
   --use_unet --val_every 250 --num_samples 100000"

run_arm() {
  local name="$1" append="$2" steps="$3" flip="$4"
  local exp="runs/scaling_$name" out="QUALITY_SCALING_${name}_r5.json"
  local extra=""
  [ "$flip" = "1" ] && extra="--flip_aug"
  echo "=== arm $name: append_train=$append steps=$steps flip=$flip ==="
  # splits rewrite over the shared (grown) tree — CPU, seconds
  $Q --n_train 32 --append_train "$append" --stage data --cpu || return 1
  $WD --progress "$exp/logs/metrics.jsonl" --init_stall 1500 --stall 900 \
      --retries 5 --sleep 60 --resume_args=--resume_last -- \
      $Q --n_train 32 --append_train "$append" --steps "$steps" $extra \
         --stage train --exp "$exp" --out "$out" || return 1
  $WD --progress "$exp/test_meshes" --init_stall 1500 --stall 900 \
      --retries 5 --sleep 60 -- \
      $Q --n_train 32 --append_train "$append" --steps "$steps" $extra \
         --stage eval --exp "$exp" --out "$out" || return 1
  echo "=== arm $name done: $out ==="
}

rc=0
run_arm 32   0  2000 0 || rc=1
run_arm 96   64 6000 0 || rc=1
run_arm 96f  64 6000 1 || rc=1
exit $rc
