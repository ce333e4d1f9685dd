#!/usr/bin/env bash
# Retry of the baked-serving benchmark after the HTTP-413 fix (baking now
# passes the restored container through jit as an argument, commit 4bbe769).
# Waits for post_render_r5.sh to release the chip, then measures the baked
# path on the finished flagship field.
#
# Usage: post_render2_r5.sh <T_WRAP_epoch>   (run via run_in_background)
set -u
T_WRAP=$1
LOG=logs/post_render2_r5.out
say() { echo "[postrender2 $(date +%H:%M:%S)] $*" >> "$LOG"; }
remain() { echo $(( T_WRAP - $(date +%s) )); }

mkdir -p logs
say "armed: T_WRAP=$(date -d @"$T_WRAP" +%H:%M:%S)"

while :; do
  grep -q "^\[postrender .*\] done" logs/post_render_r5.out 2>/dev/null \
    && { say "postrender done"; break; }
  ps aux | grep -q "[p]ost_render_r5.sh" || { say "postrender gone"; break; }
  [ "$(remain)" -lt 480 ] && { say "window exhausted waiting — exit"; exit 0; }
  sleep 20
done
sleep 15

R=$(remain)
if [ "$R" -lt 780 ]; then
  say "only ${R}s — too short for a bake attempt; exit"
  exit 0
fi
B=$(( R - 360 )); [ "$B" -gt 2100 ] && B=2100
say "baked serving FPS retry (timeout ${B}s)"
timeout "$B" python -m acn_tpu.scripts.bench_render \
  --checkpoint_path logs/r5_flagship_v1 --prefix last --frames 2 \
  --baked 256 --baked_coarse 32 \
  --skip preview_b4_half_res,preview_b4,preview_half_res,preview,routed_budget,occ_budget,occ,stratified \
  > logs/bench_render_baked2_r5.out 2>&1
RC=$?
say "rc=$RC → $(grep -E '^\{' logs/bench_render_baked2_r5.out | tail -2 | tr '\n' ' ')"
{
  echo
  echo '## bench_render: baked serving on the finished field (retry after the jit-constants fix)'
  echo '```'
  if grep -qE '^\{' logs/bench_render_baked2_r5.out; then
    grep -E '^\{' logs/bench_render_baked2_r5.out | tail -6
  else
    echo "rc=$RC — last lines:"; tail -4 logs/bench_render_baked2_r5.out
  fi
  echo '```'
} >> RESULTS_r5.md
git add RESULTS_r5.md && git commit -q -m "Append baked serving FPS (finished field) to round results" || true
say "done"
