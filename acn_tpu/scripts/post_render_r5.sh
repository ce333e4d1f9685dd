#!/usr/bin/env bash
# Final chained chip leg: after post_final_bench.sh (bench.py) releases the
# chip, re-run the bench_render leg that crashed in round5_final.sh (the
# build_context op='bench' regression, fixed in 8ceb2c8) — measured serving
# FPS on the FINISHED flagship field, baked path first (the round-4 serving
# deliverable that has never been measured on a real trained field).
#
# Usage: post_render_r5.sh <T_WRAP_epoch>   (run via run_in_background)
set -u
T_WRAP=$1
LOG=logs/post_render_r5.out
say() { echo "[postrender $(date +%H:%M:%S)] $*" >> "$LOG"; }
remain() { echo $(( T_WRAP - $(date +%s) )); }

mkdir -p logs
say "armed: T_WRAP=$(date -d @"$T_WRAP" +%H:%M:%S)"

# Wait for the post-bench leg to finish (it waits for the orchestrator, so
# transitively the chip is free when it's gone / done).
while :; do
  grep -q "^\[postbench .*\] done" logs/post_bench_r5.out 2>/dev/null \
    && { say "postbench done"; break; }
  ps aux | grep -q "[p]ost_final_bench.sh" || { say "postbench gone"; break; }
  [ "$(remain)" -lt 600 ] && { say "window exhausted waiting — exit"; exit 0; }
  sleep 30
done
sleep 15   # axon client release

RUN=logs/r5_flagship_v1
append_results() {  # $1 title, $2 file
  {
    echo
    echo "## $1"
    echo '```'
    grep -E '^\{' "$2" | tail -8 || tail -4 "$2"
    echo '```'
  } >> RESULTS_r5.md
  git add RESULTS_r5.md && git commit -q -m "Append $1 to round results" || true
}

# Leg A: baked serving FPS on the real field (skip every live regime so the
# bake runs first; includes coarse range-finder variant).
R=$(remain)
if [ "$R" -gt 900 ]; then
  B=$(( R - 480 )); [ "$B" -gt 1800 ] && B=1800
  say "leg A: baked serving FPS (timeout ${B}s)"
  timeout "$B" python -m acn_tpu.scripts.bench_render \
    --checkpoint_path "$RUN" --prefix last --frames 2 \
    --baked 256 --baked_coarse 32 \
    --skip preview_b4_half_res,preview_b4,preview_half_res,preview,routed_budget,occ_budget,occ,stratified \
    > logs/bench_render_baked_r5.out 2>&1
  say "leg A rc=$? → $(grep -E '^\{' logs/bench_render_baked_r5.out | tail -2 | tr '\n' ' ')"
  append_results "bench_render: baked serving on the finished field" logs/bench_render_baked_r5.out
fi

# Leg B: live preview regimes (routed budget path) if time remains.
R=$(remain)
if [ "$R" -gt 900 ]; then
  B=$(( R - 360 )); [ "$B" -gt 1800 ] && B=1800
  say "leg B: live preview FPS (timeout ${B}s)"
  timeout "$B" python -m acn_tpu.scripts.bench_render \
    --checkpoint_path "$RUN" --prefix last --frames 2 \
    --skip routed_budget,occ_budget,occ,stratified \
    > logs/bench_render_live_r5.out 2>&1
  say "leg B rc=$? → $(grep -E '^\{' logs/bench_render_live_r5.out | tail -2 | tr '\n' ' ')"
  append_results "bench_render: live preview regimes on the finished field" logs/bench_render_live_r5.out
fi
say "done"
