"""1080p novel-view render throughput benchmark (the viewer path).

Measures full-frame rendering FPS — the BASELINE north-star metric
("1080p novel-view render ≥ 30 FPS") — through the same chunked Renderer
the viewer and eval use, in both regimes:

* stratified (ray_samples dense sampling);
* occupancy-guided (sparse grid, the steady-state/serving regime).

Usage (standalone, synthetic scene — no dataset needed):
    python -m acn_tpu.scripts.bench_render [--hw 1080 1920] [--frames 5]

Or against a trained checkpoint:
    python -m acn_tpu.scripts.bench_render --checkpoint_path <run> --prefix best
"""

from __future__ import annotations

import argparse
import json
import os
import time
import types


def main(argv=None):
    import faulthandler

    try:  # SIGUSR1 → stack dump (diagnose silent tunnel-blocked compiles)
        import signal

        faulthandler.register(signal.SIGUSR1)
    except Exception:
        pass
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("ACN_TPU_COMPILATION_CACHE",
                       os.path.expanduser("~/.cache/acn_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _toy_problem
    from acn_tpu.occupancy.grid import OccConfig, init_occ_state
    from acn_tpu.pipelines.renderer import Renderer

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--ray_samples", type=int, default=96)
    ap.add_argument("--occ_s_max", type=int, default=256)
    ap.add_argument("--occ_s_kept", type=int, default=64)
    ap.add_argument("--chunk_points", type=int, default=4_000_000)
    ap.add_argument("--checkpoint_path", type=str, default=None)
    ap.add_argument("--prefix", type=str, default="best")
    ap.add_argument("--occupancy_frac", type=float, default=0.10)
    ap.add_argument("--occ_budget_per_ray", type=int, default=24)
    ap.add_argument("--hash", type=int, nargs=2, default=(8, 4),
                    metavar=("LEVELS", "FEATURES"))
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated regimes to skip")
    ap.add_argument("--baked", type=int, default=0, metavar="RES",
                    help="also bench the amortized serving path: bake the "
                         "field into a RES^3 voxel table (timed separately) "
                         "and render frames from it — no hash gathers or "
                         "MLP evals per sample (pipelines/baking.py)")
    ap.add_argument("--baked_budget", type=int, default=24)
    ap.add_argument("--baked_coarse", type=int, default=0,
                    help="coarse range-finder bins for the baked regimes "
                         "(0 = off): tighten [near,far] per ray so "
                         "--baked_smax fine bins concentrate on occupied "
                         "space (pair with a smaller --baked_smax)")
    ap.add_argument("--baked_sh", type=int, default=0, choices=[0, 1],
                    help="bake SH-1 view dependence (13-ch rows; gathers "
                         "stay row-count-bound so FPS should be ~flat)")
    ap.add_argument("--baked_smax", type=int, default=128,
                    help="march bins for the baked regimes — the bin tests "
                         "(N*s_max occupancy gathers) rival the trilinear "
                         "lookups at tight budgets, so this is the other "
                         "half of the baked FPS equation")
    ap.add_argument("--save_baked", type=str, default="",
                    help="also persist the baked table built for the baked "
                         "regimes as an .npz (same format as --op bake), so "
                         "one restore+bake serves both this benchmark and a "
                         "later --op eval --baked_asset quality run")
    ap.add_argument("--segscan_ab", action="store_true",
                    help="A/B the packed-compositing scan backends end-to-end "
                         "through the full serving renderer: render one "
                         "budget-path frame with the XLA associative_scan "
                         "and again with the Pallas kernel (ops/segscan.py; "
                         "interpret mode off-TPU), compare pixels, time "
                         "both. The pre-flip validation for making the "
                         "kernel the production default.")
    ap.add_argument("--mesh", type=int, default=-1, metavar="N",
                    help="shard frame row-blocks over a mesh of N devices "
                         "(0 = all available; 1 = a 1-device mesh, which "
                         "measures the shard_map machinery's overhead vs "
                         "the plain path; -1 = off). Pixel-equivalence vs "
                         "the unsharded path: tests/test_renderer_mesh.py")
    args = ap.parse_args(argv)

    H, W = args.hw
    if args.checkpoint_path:
        # bench the REAL trained field: restore exactly as eval does
        # (config layering + ARCH_KEYS + weights + occ grids)
        from acn_tpu.runner import build_context
        from acn_tpu.utils.config import parse_args as parse_P

        P_ck = parse_P(["--op", "eval",
                        "--checkpoint_path", args.checkpoint_path,
                        "--prefix", args.prefix])
        ctx = build_context(P_ck, "bench")  # unknown op ⇒ no dataset load
        cfg, variables = ctx["cfg"], ctx["variables"]
        occ_cfg = ctx["occ_cfg"] or OccConfig(resolution=128, levels=1)
        occ_states = ctx["occ_states"]
        aabb = jnp.asarray(ctx["global_aabb"], jnp.float32)
        if occ_states is None:
            occ_states = jax.vmap(
                lambda ab: init_occ_state(ab, occ_cfg)
            )(jnp.asarray(ctx["expert_aabbs"]))
            occ_states = {
                **occ_states,
                "binaries": jnp.ones_like(occ_states["binaries"]),
            }
    else:
        K = 4
        cfg, variables = _toy_problem(
            K=K, hash_log2=17, hash_levels=args.hash[0],
            hash_features=args.hash[1],
        )
        occ_cfg = OccConfig(resolution=128, levels=1, near_plane=1e-3,
                            far_plane=1e3)
        aabb = jnp.asarray([[-1, -1, -1], [1, 1, 1]], jnp.float32)

        def occ_state_k(seed):
            st = init_occ_state(aabb, occ_cfg)
            bins = (
                jax.random.uniform(jax.random.PRNGKey(seed),
                                   st["binaries"].shape)
                < args.occupancy_frac
            )
            return {**st, "binaries": bins}

        occ_states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[occ_state_k(i) for i in range(K)]
        )

        # quadrant expert AABBs (2×2 city grid with ~10% boundary overlap,
        # the drz layout) so the routed rect dispatch has real geometry
        quad = []
        for iy in (-1, 1):
            for iz in (-1, 1):
                lo = [-1.0, min(0.1 * iy, float(iy)), min(0.1 * iz, float(iz))]
                hi = [1.0, max(0.1 * iy, float(iy)), max(0.1 * iz, float(iz))]
                quad.append([lo, hi])
        variables["buffers"]["expert_aabbs"] = jnp.asarray(quad, jnp.float32)
        variables["buffers"]["centroids"] = jnp.asarray(
            [[0.0, 0.55 * iy, 0.55 * iz] for iy in (-1, 1) for iz in (-1, 1)],
            jnp.float32,
        )

    def make_renderer(budget, render_s_max=0):
        P = types.SimpleNamespace(
            ray_samples=args.ray_samples, chunk_points=args.chunk_points,
            bg_color_default="white", occ_s_max=args.occ_s_max,
            occ_s_kept=args.occ_s_kept, use_amp=True,
            occ_budget_per_ray=budget, occ_render_s_max=render_s_max,
        )
        return Renderer(cfg, P, occ_cfg)

    renderer = make_renderer(0)

    # overhead camera looking down (+x is Down in DRB), hovering above the
    # scene box at half its largest extent
    lo_np, hi_np = np.asarray(aabb[0]), np.asarray(aabb[1])
    c_np = 0.5 * (lo_np + hi_np)
    cam_x = float(lo_np[0] - 0.5 * (hi_np - lo_np).max())
    c2w = np.array(
        [[0.0, 0.0, -1.0, cam_x],
         [0.0, 1.0, 0.0, float(c_np[1])],
         [1.0, 0.0, 0.0, float(c_np[2])]], np.float32
    )
    fy = 0.7 * H
    intr = np.array([fy, fy, W / 2, H / 2], np.float32)

    out = {}
    # (name, use_occ, budget_per_ray, (H, W)); "preview" regimes mirror the
    # reference viewer's motion-preview sampling (halved sample count,
    # viewer.py:112-113) via a tight per-ray budget, full and half res.
    pH, pW = H // 2, W // 2
    # (name, use_occ, budget/ray, (H, W), routed?) — "routed" renders each
    # expert only over its image-rect (render_image_routed); "preview"
    # regimes mirror the reference viewer's motion-preview sampling
    # (viewer.py:112-113) via a tight per-ray budget, full and half res.
    # serving-path regimes first: if a bounded run times out in the dense
    # parity instruments (occ/stratified full-res, known ~100× slower), the
    # numbers that matter for the 30 FPS target are already printed.
    # Serving regimes march coarse bins (occ_render_s_max): the march's
    # N·s_max bin tests dominate frame time at tight eval budgets.
    regimes = [
        ("preview_b4_half_res", True, 4, (pH, pW), True, 32),
        ("preview_b4", True, 4, (H, W), True, 32),
        ("preview_half_res", True, 8, (pH, pW), True, 64),
        ("preview", True, 8, (H, W), True, 64),
        ("routed_budget", True, args.occ_budget_per_ray, (H, W), True, 128),
        ("occ_budget", True, args.occ_budget_per_ray, (H, W), False, 128),
        ("occ", True, 0, (H, W), False, 0),
        ("stratified", False, 0, (H, W), False, 0),
    ]
    skip = {s for s in args.skip.split(",") if s}
    mesh = None
    if args.mesh >= 0:
        from jax.sharding import Mesh

        devs = jax.devices() if args.mesh == 0 else jax.devices()[:args.mesh]
        mesh = Mesh(np.asarray(devs), axis_names=("px",))
        out["mesh_devices"] = len(devs)
    for regime, use_occ, budget, (h, w), routed, rsm in regimes:
        if regime in skip:
            continue
        renderer = make_renderer(budget, rsm)
        intr_s = intr * (h / H)  # fx, fy, cx, cy all scale with resolution
        kw = dict(H=h, W=w, intrinsics=intr_s, c2w=c2w,
                  aabb=np.asarray(aabb), use_occ=use_occ, mesh=mesh)
        render = (renderer.render_image_routed if routed
                  else renderer.render_image)
        render(variables, occ_states, **kw)  # warm / compile
        # compute-only FPS: frame stays on device (host download through the
        # remote tunnel is an environment artifact, not a serving cost)
        t0 = time.perf_counter()
        for _ in range(args.frames):
            render(variables, occ_states, download=False, **kw)
        dt = (time.perf_counter() - t0) / args.frames
        # end-to-end (incl. u8/f16 frame download)
        t0 = time.perf_counter()
        rgb, _, _ = render(variables, occ_states, **kw)
        dt_e2e = time.perf_counter() - t0
        out[f"{regime}_fps"] = round(1.0 / dt, 2)
        out[f"{regime}_ms_per_frame"] = round(dt * 1e3, 1)
        out[f"{regime}_ms_e2e"] = round(dt_e2e * 1e3, 1)
        print(json.dumps({regime: out[f"{regime}_fps"]}))  # progress line

    if args.segscan_ab:
        # End-to-end backend A/B on the budget serving path (the one regime
        # whose compositing runs through composite_packed → seg_excl_sum).
        # The backend choice is baked into jit caches at trace time
        # (ops/segscan.py docstring), so each leg gets a fresh Renderer AND
        # cleared jit caches. Off-TPU the Mosaic kernel runs in interpret
        # mode — same code path, CPU-checkable.
        on_tpu = jax.devices()[0].platform == "tpu"
        ab_h, ab_w = pH, pW  # validation, not a benchmark: half-res is ample
        frames_ab, times_ab = {}, {}
        prev = os.environ.get("ACN_TPU_SEGSCAN")
        try:
            for backend in ("xla", "pallas" if on_tpu else "interpret"):
                os.environ["ACN_TPU_SEGSCAN"] = backend
                jax.clear_caches()
                r_ab = make_renderer(8, 64)
                kw_ab = dict(H=ab_h, W=ab_w, intrinsics=intr * (ab_h / H),
                             c2w=c2w, aabb=np.asarray(aabb), use_occ=True)
                rgb_ab, _, _ = r_ab.render_image_routed(variables, occ_states,
                                                        **kw_ab)  # warm
                t0 = time.perf_counter()
                for _ in range(max(args.frames, 1)):
                    r_ab.render_image_routed(variables, occ_states,
                                             download=False, **kw_ab)
                times_ab[backend] = (time.perf_counter() - t0) / max(
                    args.frames, 1)
                frames_ab[backend] = np.asarray(rgb_ab, np.float32)
        finally:
            if prev is None:
                os.environ.pop("ACN_TPU_SEGSCAN", None)
            else:
                os.environ["ACN_TPU_SEGSCAN"] = prev
            jax.clear_caches()
        bp = next(k for k in frames_ab if k != "xla")
        max_diff = float(np.max(np.abs(frames_ab["xla"] - frames_ab[bp])))
        out["segscan_ab_max_px_diff"] = max_diff
        out["segscan_ab_xla_ms"] = round(times_ab["xla"] * 1e3, 1)
        out[f"segscan_ab_{bp}_ms"] = round(times_ab[bp] * 1e3, 1)
        out["segscan_ab_ok"] = bool(max_diff < 2e-2)  # u8-quantization scale
        print(json.dumps({"segscan_ab": {
            "max_px_diff": max_diff, "xla_ms": out["segscan_ab_xla_ms"],
            f"{bp}_ms": out[f"segscan_ab_{bp}_ms"],
            "ok": out["segscan_ab_ok"]}}))

    if args.baked > 0:
        from acn_tpu.pipelines.baking import BakedRenderer, bake_container

        t0 = time.perf_counter()
        baked = bake_container(
            variables, cfg, aabb=np.asarray(aabb),
            resolution=int(args.baked), bake_dirs=4,
            sh_degree=int(args.baked_sh),
            occ_thre=1e-4,  # the toy field is dim; keep its content
        )
        jax.block_until_ready(baked["table"])
        out["bake_s"] = round(time.perf_counter() - t0, 1)
        out["baked_res"] = int(args.baked)
        out["baked_mb"] = round(baked["table"].nbytes / 2**20, 1)
        # progress line the moment the bake lands: on the remote-TPU tunnel
        # the first baked-variant compile can take tens of minutes, and a
        # bounded run that dies there should still record the bake cost
        print(json.dumps({"bake_s": out["bake_s"],
                          "baked_mb": out["baked_mb"]}), flush=True)
        if args.save_baked:
            from acn_tpu.pipelines.baking import save_baked

            os.makedirs(os.path.dirname(args.save_baked) or ".",
                        exist_ok=True)
            save_baked(args.save_baked, baked)
            print(json.dumps({"saved_baked": args.save_baked}), flush=True)
        br = BakedRenderer(baked, s_max=args.baked_smax,
                           budget_per_ray=args.baked_budget,
                           chunk_points=args.chunk_points)
        variants = [("baked", br, (H, W)), ("baked_half_res", br, (pH, pW))]
        if args.baked_coarse > 0:
            # same bake, range-finding pre-pass + proportionally fewer fine
            # bins — the march-cost lever (BASELINE round-4 accounting)
            br_c = BakedRenderer(
                baked, s_max=max(args.baked_smax // 4, 32),
                budget_per_ray=args.baked_budget,
                chunk_points=args.chunk_points, s_coarse=args.baked_coarse)
            variants.append(("baked_coarse", br_c, (H, W)))
        for name, r_b, (h, w) in variants:
            if name in skip:
                continue
            intr_s = intr * (h / H)
            kw2 = dict(H=h, W=w, intrinsics=intr_s, c2w=c2w, mesh=mesh)
            r_b.render_image(**kw2)  # warm/compile
            t0 = time.perf_counter()
            for _ in range(args.frames):
                r_b.render_image(download=False, **kw2)
            dt = (time.perf_counter() - t0) / args.frames
            out[f"{name}_fps"] = round(1.0 / dt, 2)
            out[f"{name}_ms_per_frame"] = round(dt * 1e3, 1)
            print(json.dumps({name: out[f"{name}_fps"]}))

    out.update({"H": H, "W": W, "ray_samples": args.ray_samples,
                "occ_s_kept": args.occ_s_kept,
                "hash": list(args.hash)})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
