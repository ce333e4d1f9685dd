#!/usr/bin/env bash
# Flagship completion protocol (VERDICT r3 item 2): the full 62-view TTO
# sweep from the finished 10k-step checkpoint, under the reference's eval
# semantics (reference nerf_runner.py:322-367 — per-view test-time
# optimization on support rays, then full-image PSNR/SSIM/LPIPS).
#
# Usage: scripts/eval_flagship.sh [run_dir=logs/r3_flagship] [prefix=last]
# ~15 min (tto 0) + ~25 min (tto 16) + ~50 min (tto 128) on one v5e chip.
#
# The reference released checkpoint (README.md:196, v1.0/4_experts.zip)
# cannot be fetched in this zero-egress image; scripts/convert_reference_ckpt.py
# stands ready for the true side-by-side wherever it is available.
set -u
RUN="${1:-logs/r3_flagship}"
PREFIX="${2:-last}"
STAMP=$(date +%m%d_%H%M)
for TTO in 0 16 128; do
  python -u nerf_runner.py --op eval --configPath configs/eval.json \
    --checkpoint_path "$RUN" --prefix "$PREFIX" \
    --tto "$TTO" --fname "flagship_eval_tto${TTO}_${STAMP}" \
    > "logs/flagship_eval_tto${TTO}_${STAMP}.out" 2>&1
  echo "tto=$TTO rc=$? ($(date +%H:%M:%S))"
  tail -3 "logs/flagship_eval_tto${TTO}_${STAMP}.out"
done
echo FLAGSHIP_EVAL_DONE
