#!/usr/bin/env bash
# Post-orchestrator bench leg: the moment round5_final.sh releases the chip
# ("done; TPU free" in logs/final_r5.out, or its process is gone), run the
# driver's scoreboard benchmark (bench.py) once, bounded to finish well
# before T_WRAP so the driver's own round-end bench.py never contends for
# the chip. Two wins: a measured L8F4 reference-scale number lands in the
# committed record, and the persistent XLA cache is warm for the driver's
# run (bench.py compiles a different program than the training step —
# reference-scale 4000/2000 episodes — so the flagship run does not warm it).
#
# Usage: post_final_bench.sh <T_WRAP_epoch>   (run via run_in_background)
set -u
T_WRAP=$1
LOG=logs/post_bench_r5.out
say() { echo "[postbench $(date +%H:%M:%S)] $*" >> "$LOG"; }
remain() { echo $(( T_WRAP - $(date +%s) )); }

mkdir -p logs
say "armed: T_WRAP=$(date -d @"$T_WRAP" +%H:%M:%S)"

# Wait for the final orchestrator to release the chip.
while :; do
  grep -q "done; TPU free" logs/final_r5.out 2>/dev/null && { say "orchestrator done"; break; }
  ps aux | grep -q "[r]ound5_final.sh" || { say "orchestrator process gone"; break; }
  [ "$(remain)" -lt 420 ] && { say "window exhausted while waiting — exit"; exit 0; }
  sleep 30
done
sleep 15   # let the axon client fully release the chip

R=$(remain)
if [ "$R" -lt 720 ]; then
  say "only ${R}s left — too short for a bench attempt; exit"
  exit 0
fi
B=$(( R - 300 ))
say "running bench.py (timeout ${B}s)"
timeout "$B" python bench.py > logs/bench_r5_json.out 2>&1
RC=$?
say "bench.py rc=$RC → $(tail -1 logs/bench_r5_json.out | tr -d '\n' | head -c 400)"

{
  echo
  echo '## bench.py (scoreboard metric, run post-orchestrator on the freed chip)'
  echo '```'
  if [ "$RC" -eq 0 ]; then
    tail -2 logs/bench_r5_json.out
  else
    echo "rc=$RC (timeout ${B}s) — last lines:"
    tail -4 logs/bench_r5_json.out
  fi
  echo '```'
} >> RESULTS_r5.md
git add RESULTS_r5.md && git commit -q -m "Append post-orchestrator bench.py result to round results" \
  && say "committed" || say "commit failed"
say "done"
