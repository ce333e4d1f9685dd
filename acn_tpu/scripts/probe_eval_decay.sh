#!/usr/bin/env bash
# Decay probe (VERDICT r4 item 3): the round-5 flagship's mid-train eval
# instrument peaked 17.19 @ step 7400 and decayed to 15.96 by step 10000
# while train-query PSNR kept climbing — an overfit/drift signal. This
# probes whether the decay is REAL on the full-image eval protocol (not the
# 4-task episodic instrument): run tto=0 full-frame eval on a capped view
# subset from several step-tagged checkpoints of a finished run.
#
# Usage: probe_eval_decay.sh <run_dir> [step ...]   (default: 2000 4000 6000 8000 10000)
# Output: logs/probe_decay_step{N}.out ; summary line per step on stdout.
set -u
RUN=$1; shift
STEPS=${*:-"2000 4000 6000 8000 10000"}
for S in $STEPS; do
  TAG="step${S}"
  [ -f "$RUN/${TAG}.model" ] || { echo "[probe] $TAG missing in $RUN — skip"; continue; }
  timeout 1500 python -u nerf_runner.py --op eval --configPath configs/eval.json \
    --checkpoint_path "$RUN" --prefix "$TAG" --tto 0 --cap_images 8 \
    --fname "probe_decay_${TAG}" > "logs/probe_decay_${TAG}.out" 2>&1
  echo "[probe] $TAG rc=$? → $(grep -E 'psnr|PSNR' "logs/probe_decay_${TAG}.out" | tail -2 | tr '\n' ' ')"
done
