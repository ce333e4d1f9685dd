#!/usr/bin/env bash
# Round-6 interactive post-training chip legs, value-ordered. Writes the
# same canonical outputs round6_final.sh checks, so the deadline fallback
# never double-runs a leg. Marks logs/.leg_active while a leg holds the
# chip. Run AFTER the flagship supervisor exits.
#
# Usage: r6_legs.sh <run_dir> [legs...]
#   legs default: baked eval0 eval16 segscan eval128 decay live video
set -u
RUN=$1; shift
LEGS=${*:-"baked eval0 eval16 segscan bakedq eval128 decay live video"}
PFX=last; [ -f "$RUN/last.model" ] || PFX=best
say() { echo "[legs $(date +%H:%M:%S)] $*"; }
leg() { # <name> <outfile> <bound> <cmd...>
  local name=$1 out=$2 bound=$3; shift 3
  [ -s "$out" ] && { say "$name: output present — skip"; return 0; }
  touch logs/.leg_active
  say "$name: start (bound ${bound}s)"
  timeout "$bound" "$@" > "$out" 2>&1
  local rc=$?
  rm -f logs/.leg_active
  say "$name: rc=$rc → $(tail -2 "$out" | tr '\n' ' ' | tail -c 250)"
  return $rc
}

for L in $LEGS; do
  case $L in
    baked)
      # prefix best: params-only checkpoint — half the tunnel upload of
      # 'last' (no optimizer/occ states; baking never reads them), and the
      # better serving asset anyway (peak-eval field)
      leg baked logs/bench_render_baked_r6.out 5400 \
        python -m acn_tpu.scripts.bench_render \
          --checkpoint_path "$RUN" --prefix best --frames 2 \
          --baked 256 --baked_coarse 32 \
          --skip preview_b4_half_res,preview_b4,preview_half_res,preview,routed_budget,occ_budget,occ,stratified ;;
    eval0)
      leg eval0 logs/r6_eval_best_tto0.out 2400 \
        python -u nerf_runner.py --op eval --configPath configs/eval.json \
          --checkpoint_path "$RUN" --prefix best --tto 0 --fname r6_eval_best_tto0 ;;
    eval16)
      leg eval16 logs/r6_eval_best_tto16.out 2700 \
        python -u nerf_runner.py --op eval --configPath configs/eval.json \
          --checkpoint_path "$RUN" --prefix best --tto 16 --fname r6_eval_best_tto16 ;;
    eval128)
      leg eval128 logs/r6_eval_best_tto128.out 4200 \
        python -u nerf_runner.py --op eval --configPath configs/eval.json \
          --checkpoint_path "$RUN" --prefix best --tto 128 --fname r6_eval_best_tto128 ;;
    segscan)
      # budget-regime fwd+bwd through the meta-train step at flagship-ish
      # scale, pallas vs xla — the backward-kernel validation gating the
      # default flip (VERDICT item 4)
      touch logs/.leg_active
      ACN_TPU_SEGSCAN=pallas ACN_BENCH_REGIMES=budget \
        ACN_BENCH_SCALE="4,3,1024,512,8,5" \
        timeout 2400 python bench.py --inner \
        > logs/bench_segscan_pallas_r6.out 2>&1
      say "segscan pallas rc=$? → $(tail -1 logs/bench_segscan_pallas_r6.out | tail -c 250)"
      ACN_TPU_SEGSCAN=xla ACN_BENCH_REGIMES=budget \
        ACN_BENCH_SCALE="4,3,1024,512,8,5" \
        timeout 2400 python bench.py --inner \
        > logs/bench_segscan_xla_r6.out 2>&1
      say "segscan xla rc=$? → $(tail -1 logs/bench_segscan_xla_r6.out | tail -c 250)"
      rm -f logs/.leg_active ;;
    decay)
      touch logs/.leg_active
      bash acn_tpu/scripts/probe_eval_decay.sh "$RUN" \
        > logs/probe_decay_r6.out 2>&1
      say "decay probe → $(tail -4 logs/probe_decay_r6.out | tr '\n' ' ' | tail -c 400)"
      rm -f logs/.leg_active ;;
    bakedq)
      # baked-vs-live quality delta (VERDICT item 1, second half): persist
      # the asset with --op bake (compile warm from the baked bench leg),
      # then score the 62 val views from the table at tto=0; compare
      # against logs/r6_eval_best_tto0.out
      touch logs/.leg_active
      timeout 3000 python -u nerf_runner.py --op bake \
        --checkpoint_path "$RUN" --prefix best --bake_resolution 256 \
        --fname r6_bake > logs/r6_bake.out 2>&1
      say "bake rc=$? → $(tail -1 logs/r6_bake.out | tail -c 200)"
      timeout 3000 python -u nerf_runner.py --op eval \
        --configPath configs/eval.json --checkpoint_path "$RUN" \
        --prefix best --baked_asset logs/r6_bake/baked_256.npz \
        --tto 0 --fname r6_eval_baked > logs/r6_eval_baked.out 2>&1
      say "baked eval rc=$? → $(tail -2 logs/r6_eval_baked.out | tr '\n' ' ' | tail -c 250)"
      rm -f logs/.leg_active ;;
    live)
      leg live logs/bench_render_live_r6.out 2700 \
        python -m acn_tpu.scripts.bench_render \
          --checkpoint_path "$RUN" --prefix "$PFX" --frames 2 \
          --skip preview_half_res,preview,occ,stratified ;;
    video)
      leg video logs/r6_video.out 2700 \
        python -u nerf_runner.py --op video --configPath configs/eval.json \
          --checkpoint_path "$RUN" --prefix best --camera_path turntable \
          --fname r6_video ;;
    *) say "unknown leg $L" ;;
  esac
done
say "all requested legs done"
