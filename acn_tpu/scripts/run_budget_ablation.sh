#!/usr/bin/env bash
# Episode-budget ablation (VERDICT r3 missing #4): the flagship trains at
# support 1024 / query 512 rays per task while the reference default is
# 4000 / 2000 (reference configs/train.json:20-21) — a 4× episode-scale
# deviation. This measures what the smaller budget costs: two matched
# fresh runs on the bundled drz example, identical in everything but the
# per-task ray budget, compared on the mid-train eval query PSNR
# trajectory at EQUAL STEPS and (via the logged s/it) at equal wall-clock.
#
# Cost on one v5e chip: ~0.9 s/it small + ~2.6 s/it reference-scale at
# these settings ≈ 35 min + 1h45m for 800 steps each. Run when the chip is
# free (not alongside the flagship).
set -u
COMMON="--op train --configPath configs/train_occ.json
  --outer_steps 800 --eval_step 100 --save_step 800 --print_step 50
  --watchdog_timeout 1200"
python -u nerf_runner.py $COMMON \
  --support_rays 1024 --query_rays 512 --fname abl_budget_1024 \
  > logs/abl_budget_1024.out 2>&1
echo "small rc=$?"
python -u nerf_runner.py $COMMON \
  --support_rays 4000 --query_rays 2000 --fname abl_budget_4000 \
  > logs/abl_budget_4000.out 2>&1
echo "reference-scale rc=$?"
echo BUDGET_ABLATION_DONE
