#!/usr/bin/env bash
# Decay probe (VERDICT r4 item 3): the round-5 flagship's mid-train eval
# instrument peaked 17.19 @ step 7400 and decayed to 15.96 by step 10000
# while train-query PSNR kept climbing — an overfit/drift signal. This
# probes whether the decay is REAL on the full-image eval protocol (not the
# noisy 4-task episodic instrument): run tto=0 full-frame eval on a FIXED
# 8-view subset (cap_metadata seeds rng(0) — same views every probe) from
# several step-tagged checkpoints of a finished run.
#
# Usage: probe_eval_decay.sh <run_dir> [step ...]
#   default: up to 5 evenly spaced steps among the tags actually on disk
#   (async step saves coalesce under tunnel pressure, so tags are irregular)
# Output: logs/probe_decay_step{N}.out ; summary line per step on stdout.
set -u
RUN=$1; shift
if [ $# -gt 0 ]; then
  STEPS="$*"
else
  AVAIL=$(ls "$RUN" | grep -oE '^step[0-9]+' | grep -oE '[0-9]+' | sort -n | uniq)
  N=$(echo "$AVAIL" | wc -w)
  if [ "$N" -le 5 ]; then
    STEPS=$AVAIL
  else
    # first, last, and three evenly spaced between
    STEPS=$(echo $AVAIL | tr ' ' '\n' | awk -v n="$N" '
      { a[NR]=$0 } END {
        print a[1]; print a[int((n+3)/4)]; print a[int((n+1)/2)];
        print a[int(3*(n+1)/4)]; print a[n] }' | sort -n | uniq)
  fi
fi
echo "[probe] run=$RUN steps: $(echo $STEPS | tr '\n' ' ')"
for S in $STEPS; do
  TAG="step${S}"
  [ -f "$RUN/${TAG}.model" ] || { echo "[probe] $TAG missing in $RUN — skip"; continue; }
  timeout 1500 python -u nerf_runner.py --op eval --configPath configs/eval.json \
    --checkpoint_path "$RUN" --prefix "$TAG" --tto 0 --cap_images 8 \
    --fname "probe_decay_${TAG}" > "logs/probe_decay_${TAG}.out" 2>&1
  echo "[probe] $TAG rc=$? → $(grep -E 'psnr|PSNR' "logs/probe_decay_${TAG}.out" | tail -2 | tr '\n' ' ')"
done
