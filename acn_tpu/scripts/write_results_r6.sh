#!/usr/bin/env bash
# Collate the round-6 canonical leg outputs into RESULTS_r6.md (the
# interactive, richer sibling of round6_final.sh's fallback writer).
# Usage: write_results_r6.sh <run_dir>
set -u
RUN=$1
{
  echo "# Round-6 measured results"
  echo
  echo "Written $(date -u +%FT%TZ). Raw outputs under logs/ (untracked)."
  echo "All numbers: one v5e chip through the axon tunnel, bf16 AMP."
  echo
  echo '## Flagship training state (retrained this round — logs/ are wiped between rounds)'
  echo '```'
  python -m acn_tpu.scripts.summarize_run "$RUN" 2>&1
  echo '```'
  echo
  echo '## Baked serving on the finished field (VERDICT item 1 — must-land)'
  echo '```'
  grep -E '^\{' logs/bench_render_baked_r6.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## Baked-vs-live quality delta (62 views, tto=0)'
  echo '### live (best checkpoint)'
  echo '```'
  tail -8 logs/r6_eval_best_tto0.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo '### baked asset (256³)'
  echo '```'
  tail -8 logs/r6_eval_baked.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## 62-view TTO sweep from BEST (reference protocol; VERDICT item 3)'
  for TTO in 16 128; do
    echo "### tto=$TTO"
    echo '```'
    tail -8 "logs/r6_eval_best_tto${TTO}.out" 2>/dev/null || echo "(not run)"
    echo '```'
  done
  echo
  echo '## Eval-decay probe: full-image tto=0 PSNR across step checkpoints'
  echo '```'
  grep "\[probe\]" logs/probe_decay_r6.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## Mid-train eval trajectory (episodic 4-task instrument, stratified)'
  echo '```'
  { grep "\[eval\]" "$RUN/log.txt" 2>/dev/null \
      || grep "\[eval\]" "${RUN}_supervisor.log" 2>/dev/null; } | tail -15
  echo '```'
  echo
  echo '## Pallas segscan on the training hot path (budget regime fwd+bwd, flagship scale)'
  echo '```'
  echo "pallas: $(grep -E '^\{' logs/bench_segscan_pallas_r6.out 2>/dev/null | tail -1)"
  echo "xla:    $(grep -E '^\{' logs/bench_segscan_xla_r6.out 2>/dev/null | tail -1)"
  echo '```'
  echo
  echo '## bench.py scoreboard (all four regimes, incl. the new auto-regime field)'
  echo '```'
  grep -E '^\{' logs/bench_r6.out 2>/dev/null | tail -1 || echo "(not run)"
  echo '```'
  echo
  echo '## Live serving regimes on the finished field'
  echo '```'
  grep -E '^\{' logs/bench_render_live_r6.out 2>/dev/null || echo "(not run)"
  echo '```'
  echo
  echo '## Turntable video'
  echo '```'
  tail -4 logs/r6_video.out 2>/dev/null || echo "(not run)"
  echo '```'
} > RESULTS_r6.md
echo "RESULTS_r6.md written"
