#!/usr/bin/env bash
# Round-6 END-GAME orchestrator (deadline fallback).
#
# The builder session drives the post-training chip legs interactively,
# writing each leg's output to a CANONICAL file (listed below). This script
# guarantees the round still lands its numbers if that session stalls:
#
#   0. stop the flagship gracefully at T_STOP = T_WRAP − 10800 s;
#   1. at T_FALLBACK = T_WRAP − 6600 s: run any missing must-land legs
#      (baked serving bench; eval-from-best tto 0/16) when the chip is free
#      and no interactive leg is active (logs/.leg_active, <2 h old);
#   2. at T_WRAP − 900 s: write RESULTS_r6.md from whatever canonical
#      outputs exist and commit it.
#
# Canonical leg outputs (the interactive session writes the same paths):
#   logs/bench_render_baked_r6.out   — baked serving FPS (must-land)
#   logs/r6_eval_best_tto0.out       — 62-view tto=0 from BEST
#   logs/r6_eval_best_tto16.out      — 62-view tto=16 from BEST
#   logs/r6_eval_best_tto128.out     — tto=128 (possibly capped)
#   logs/bench_segscan_pallas_r6.out — bench.py budget regime, pallas bwd
#   logs/bench_segscan_xla_r6.out    — same scale, xla twin
#   logs/bench_render_live_r6.out    — live 1080p regimes on the real field
#   logs/r6_video.out                — turntable video render
#
# Usage: round6_final.sh <T_WRAP_epoch>   (run via run_in_background)
set -u
T_WRAP=$1
LOG=logs/final_r6.out
say() { echo "[final $(date +%H:%M:%S)] $*" >> "$LOG"; }
remain() { echo $(( T_WRAP - $(date +%s) )); }
newest_run() {
  ls -dt logs/r6_flagship* 2>/dev/null | while read -r d; do
    [ -f "$d/last.model" ] || [ -f "$d/best.model" ] && { echo "$d"; break; }
  done
}
chip_busy() {
  # any python holding the axon chip (trainer, eval, bench) — the [x]
  # bracket trick keeps this grep from matching itself
  ps aux | grep -qE "[n]erf_runner\.py|[b]ench_render|[b]ench\.py --inner|[s]upervise_train" && return 0
  # interactive leg marker, honored unless stale (>2 h)
  if [ -f logs/.leg_active ]; then
    local age=$(( $(date +%s) - $(stat -c %Y logs/.leg_active) ))
    [ "$age" -lt 7200 ] && return 0
  fi
  return 1
}

mkdir -p logs
say "armed: T_WRAP=$(date -d @"$T_WRAP" +%H:%M:%S) (remain $(remain)s)"

# ---- 0. training window: let it run; graceful stop at T_STOP.
T_STOP=$(( T_WRAP - 10800 ))
while ps aux | grep -q "[s]upervise_train.sh r6_flagship"; do
  if [ "$(date +%s)" -ge "$T_STOP" ]; then
    SUP=$(ps aux | grep "[s]upervise_train.sh r6_flagship" | awk '{print $2}' | head -1)
    TRAINER=$(ps aux | grep "[n]erf_runner.py --op train --fname r6_flagship" | awk '{print $2}' | head -1)
    say "T_STOP: supervisor=$SUP trainer=${TRAINER:-none} — graceful stop"
    [ -n "${SUP:-}" ] && kill "$SUP" 2>/dev/null
    if [ -n "${TRAINER:-}" ]; then
      kill -TERM "$TRAINER" 2>/dev/null
      # graceful exit = finish step + synchronous 'last' save (~1.3 GB at
      # ~1 MB/s measured tunnel throughput ⇒ up to ~25 min); killing it
      # mid-save would strand the round on the older step-tagged saves
      for i in $(seq 1 120); do
        kill -0 "$TRAINER" 2>/dev/null || break
        sleep 15
      done
      kill -0 "$TRAINER" 2>/dev/null && { say "SIGKILL trainer"; kill -9 "$TRAINER"; }
    fi
    break
  fi
  sleep 60
done
RUN=$(newest_run)
[ -z "${RUN:-}" ] && RUN=logs/r6_flagship
say "training window closed; remain=$(remain)s; RUN=$RUN"

# ---- 1. fallback legs (only if missing, chip free, and past T_FALLBACK).
T_FALLBACK=$(( T_WRAP - 6600 ))
while [ "$(date +%s)" -lt "$T_FALLBACK" ] && [ "$(remain)" -gt 900 ]; do
  sleep 60
done
run_leg() { # <outfile> <bound_s> <cmd...>
  local out=$1 bound=$2; shift 2
  [ -s "$out" ] && { say "leg $out present — skip"; return; }
  while chip_busy; do
    [ "$(remain)" -lt 1200 ] && { say "leg $out: no window left"; return; }
    sleep 45
  done
  [ "$(remain)" -lt $(( bound / 2 )) ] && { say "leg $out: window too small"; return; }
  local b=$bound
  [ "$b" -gt $(( $(remain) - 900 )) ] && b=$(( $(remain) - 900 ))
  say "leg $out: launching (bound ${b}s)"
  timeout "$b" "$@" > "$out" 2>&1
  say "leg $out rc=$? → $(tail -2 "$out" | tr '\n' ' ' | tail -c 300)"
}
if [ "$(remain)" -gt 900 ]; then
  PFX=last; [ -f "$RUN/last.model" ] || PFX=best
  run_leg logs/bench_render_baked_r6.out 5400 \
    python -m acn_tpu.scripts.bench_render \
      --checkpoint_path "$RUN" --prefix best --frames 2 \
      --baked 256 --baked_coarse 32 \
      --skip preview_b4_half_res,preview_b4,preview_half_res,preview,routed_budget,occ_budget,occ,stratified
  run_leg logs/r6_eval_best_tto0.out 2400 \
    python -u nerf_runner.py --op eval --configPath configs/eval.json \
      --checkpoint_path "$RUN" --prefix best --tto 0 --fname r6_eval_best_tto0
  run_leg logs/r6_eval_best_tto16.out 2700 \
    python -u nerf_runner.py --op eval --configPath configs/eval.json \
      --checkpoint_path "$RUN" --prefix best --tto 16 --fname r6_eval_best_tto16
fi

# ---- 2. durable record.
while [ "$(remain)" -gt 900 ]; do sleep 60; done
{
  echo "# Round-6 measured results (auto-written by round6_final.sh)"
  echo
  echo "Written $(date -u +%FT%TZ). Raw outputs under logs/ (untracked)."
  echo
  echo '## Flagship training state'
  echo '```'
  python -m acn_tpu.scripts.summarize_run "$RUN" 2>&1
  echo '```'
  echo
  echo '## Baked serving on the finished field (must-land)'
  echo '```'
  tail -c 2000 logs/bench_render_baked_r6.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## 62-view TTO sweep from BEST (reference protocol)'
  for TTO in 0 16 128; do
    echo "### tto=$TTO"
    echo '```'
    tail -8 "logs/r6_eval_best_tto${TTO}.out" 2>/dev/null || echo "(not run)"
    echo '```'
  done
  echo
  echo '## Pallas segscan: budget-regime fwd+bwd on-chip (default-flip check)'
  echo '```'
  echo "pallas: $(tail -c 600 logs/bench_segscan_pallas_r6.out 2>/dev/null || echo '(not run)')"
  echo "xla:    $(tail -c 600 logs/bench_segscan_xla_r6.out 2>/dev/null || echo '(not run)')"
  echo '```'
  echo
  echo '## Live serving regimes on the finished field'
  echo '```'
  tail -c 1500 logs/bench_render_live_r6.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## Turntable video'
  echo '```'
  tail -4 logs/r6_video.out 2>/dev/null || echo "(not run)"
  echo '```'
} > RESULTS_r6.md
git add RESULTS_r6.md && git commit -q -m "Round-6 measured results (auto-committed by final orchestrator)" \
  && say "RESULTS_r6.md committed" || say "RESULTS_r6.md commit failed"
say "done"
