"""bench_render end-to-end smoke at tiny scale on the CPU backend.

The baked serving leg is the round's must-land chip measurement; this
exercises the exact script path (arg parsing, skip list, bake, coarse
variant, JSON output) so its first Python error never happens on the chip
(round-5 lost two bounded chip windows to exactly that class of failure).
"""

import json

import pytest


def test_bench_render_baked_leg_tiny(capsys, tmp_path):
    from acn_tpu.pipelines.baking import load_baked
    from acn_tpu.scripts import bench_render

    npz = tmp_path / "baked_16.npz"
    bench_render.main([
        "--hw", "24", "32", "--frames", "1",
        "--baked", "16", "--baked_coarse", "4", "--baked_smax", "32",
        "--save_baked", str(npz),
        "--skip",
        "preview_b4_half_res,preview_b4,preview_half_res,preview,"
        "routed_budget,occ_budget,occ,stratified",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines, "no JSON output"
    out = json.loads(lines[-1])
    # the three baked variants all produced FPS numbers
    for key in ("baked_fps", "baked_half_res_fps", "baked_coarse_fps"):
        assert key in out and out[key] > 0, key
    assert out["bake_s"] > 0 and out["baked_res"] == 16
    # --save_baked persisted a loadable asset (one restore+bake serves both
    # the FPS bench and the --op eval --baked_asset quality leg)
    baked = load_baked(npz)
    assert baked["table"].shape[0] == 16 ** 3


def test_bench_render_one_live_regime_tiny(capsys):
    from acn_tpu.scripts import bench_render

    bench_render.main([
        "--hw", "24", "32", "--frames", "1", "--occ_s_max", "32",
        "--occ_s_kept", "16",
        "--skip",
        "preview_b4,preview_half_res,preview,routed_budget,occ_budget,"
        "occ,stratified",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    out = json.loads(lines[-1])
    assert out["preview_b4_half_res_fps"] > 0
