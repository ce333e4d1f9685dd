"""Tiny-scale smoke of bench.py's exact regime-construction code.

The scoreboard script runs unattended at round end on the real chip; its
first Python error must surface here, not there. ACN_BENCH_SCALE shrinks
(K,T,S,Q,INNER,iters) without touching the code path."""

import io
import json
import os
import sys

import pytest


def test_bench_main_tiny_scale(monkeypatch):
    monkeypatch.setenv("ACN_BENCH_SCALE", "2,2,48,24,2,1")
    monkeypatch.setenv("ACN_BENCH_HASH", "2,2")
    monkeypatch.setenv("ACN_TPU_COMPILATION_CACHE", "/tmp/acn_bench_smoke_xla")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        bench.main()
    finally:
        sys.stdout = stdout

    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print exactly one line, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "meta_train_ray_renders_per_sec_occ"
    assert rec["unit"] == "rays/s"
    # all three regimes must have produced real numbers (the budget regime's
    # silent except-branch zeroes it — that counts as a failure here)
    for key in (
        "value",
        "stratified_rays_per_sec",
        "occ_per_ray_rays_per_sec",
        "occ_budget_rays_per_sec",
    ):
        assert rec[key] > 0, f"{key} not measured: {rec}"
    assert rec["vs_baseline"] > 0
