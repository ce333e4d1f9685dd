#!/usr/bin/env bash
# Quality ablations at equal parameter capacity (VERDICT r2 item 4):
#   A: cell L16F2 (default)  vs  corner L16F2 (reference-identical oracle)
#   B: cell L16F2            vs  cell L8F4 (half the row traffic)
# Short stratified runs on the bundled drz example; compared on the
# mid-train eval query PSNR trajectory at equal steps.
set -u
COMMON="--op train --configPath configs/train.json
  --outer_steps 800 --eval_step 100 --save_step 800 --print_step 50
  --support_rays 512 --query_rays 256 --inner_iter 8 --ray_samples 64
  --log2_hashmap_size 18 --max_res 2048 --watchdog_timeout 1200"
python -u nerf_runner.py $COMMON --hash_layout cell   --hash_levels 16 --hash_features 2 --fname abl_cell_l16f2  > logs/abl_cell_l16f2.out 2>&1
python -u nerf_runner.py $COMMON --hash_layout cell   --hash_levels 8  --hash_features 4 --fname abl_cell_l8f4   > logs/abl_cell_l8f4.out 2>&1
python -u nerf_runner.py $COMMON --hash_layout corner --hash_levels 16 --hash_features 2 --fname abl_corner_l16f2 > logs/abl_corner_l16f2.out 2>&1
echo ABLATIONS_DONE
