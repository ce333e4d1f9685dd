"""Roofline accounting for the occ-regime meta-train step.

VERDICT r2 weak #1: "the step is not shown to be roofline-bound — nobody
multiplied the primitives out". This script does exactly that on real
hardware: it times the full occ meta-step (bench.py's configuration), then
its components in isolation, and prints a decomposition table that says
where the seconds go and how far each part sits from the measured
gather/scatter ceilings (acn_tpu/ops/bench_gather_scatter.py).

Components timed (each its own small jit; compile-cached):

  full_step       the complete jitted FoMAML occ meta-step (the bench number)
  march           occupancy marching for one episode's support+query rays
  episode_fwd     one episode loss forward (support render, 4000 rays)
  episode_grad    one episode value_and_grad (the inner-loop unit: fwd+bwd)
  hash_fwd        hash-encode forward alone at the episode's row count
  hash_grad       hash-encode fwd+bwd (adds backward re-gather + scatter)
  mlp_grad        σ/color MLP fwd+bwd alone at the episode's point count
  opt_update      one outer Adam update on the full parameter tree

The step runs K×T×(I support + 1 query) = 4×3×9 = 108 episode renders; 96 of
them are inner fwd+bwd units and 12 are query fwd+bwd. Predicted step time ≈
108 × episode_grad (+ 12 × march/episode + opt_update); the gap between that
and full_step is scheduling/fusion slack.

Usage:  python -m acn_tpu.ops.bench_step_breakdown [--profile DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import time
import types


def _sync(x):
    import jax

    jax.block_until_ready(x)
    # remote-tunnel platforms: block_until_ready alone does not always
    # synchronize; force one scalar transfer
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def _time(fn, *args, iters=4, warmup=1, label=""):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    if label:
        print(f"# {label}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace of the full step here")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args(argv)

    # USR1 stack dumps (long tunnel compiles look like hangs) + keepalive
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1)
    except (AttributeError, ValueError):
        pass

    cache = os.path.expanduser("~/.cache/acn_tpu_xla")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from acn_tpu.runner import _start_tunnel_keepalive

    _start_tunnel_keepalive()

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _toy_problem
    from acn_tpu.models import container as cont
    from acn_tpu.models.encodings import hash_encode
    from acn_tpu.occupancy import grid as occ_grid
    from acn_tpu.occupancy.grid import OccConfig, init_occ_state
    from acn_tpu.pipelines.offline_stage.train_step import (
        make_episode_loss,
        make_meta_train_step,
    )
    from acn_tpu.utils.optim import build_optimizer

    K, T, S, Q = 4, 3, 4000, 2000
    INNER = 8
    cfg, variables = _toy_problem(K=K, hash_log2=16, hash_levels=16)
    hash_cfg = cfg.expert.hash

    P = types.SimpleNamespace(
        algo="fomaml", inner_iter=INNER, inner_lr=0.015, ray_samples=96,
        color_space="linear", bg_color_default="white", optimizer="adam",
        encoding_lr=1e-2, sigma_lr=2e-3, color_lr=2e-3, bg_lr=1e-3, lr=1e-4,
        outer_steps=10_000, decay_factor=10.0, no_scheduler=False,
        grad_clip=1.0, occ_s_max=256, occ_s_kept=64, use_amp=True,
        train_chunk_rays=0, fim=False,
    )
    labels = cont.param_group_labels(variables, cfg)
    opt = build_optimizer(P, labels, grad_clip=P.grad_clip)

    rng = np.random.default_rng(0)
    o = np.concatenate(
        [rng.uniform(-0.5, 0.5, (K, T, S + Q, 2)).astype(np.float32),
         np.full((K, T, S + Q, 1), 2.0, np.float32)], axis=-1)
    d = rng.normal(size=(K, T, S + Q, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[..., 2] = -np.abs(d[..., 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nf = np.concatenate(
        [np.full((K, T, S + Q, 1), 1.0, np.float32),
         np.full((K, T, S + Q, 1), 3.0, np.float32)], axis=-1)
    rays = np.concatenate([o, d, nf], axis=-1)
    rgbs = rng.uniform(0, 1, (K, T, S + Q, 3)).astype(np.float32)
    batch = {
        "support_rays": jnp.asarray(rays[:, :, :S]),
        "support_rgbs": jnp.asarray(rgbs[:, :, :S]),
        "query_rays": jnp.asarray(rays[:, :, S:]),
        "query_rgbs": jnp.asarray(rgbs[:, :, S:]),
    }

    occ_cfg = OccConfig(resolution=128, levels=1, near_plane=1e-3, far_plane=1e3)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], jnp.float32)

    def occ_state_k(seed):
        st = init_occ_state(aabb, occ_cfg)
        bins = (jax.random.uniform(jax.random.PRNGKey(seed),
                                   st["binaries"].shape) < 0.10)
        return {**st, "binaries": bins}

    occ_states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[occ_state_k(i) for i in range(K)]
    )

    state = {
        "variables": variables,
        "opt_state": opt.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }

    results = {}

    # ---- full step ----
    step_occ = jax.jit(make_meta_train_step(cfg, P, opt, occ_cfg))
    key = jax.random.PRNGKey(0)

    def run_step():
        _, m = step_occ(state, batch, occ_states, key)
        return m["loss_total"]

    results["full_step"] = _time(run_step, iters=args.iters, label="full_step")

    if args.profile:
        jax.profiler.start_trace(args.profile)
        _sync(run_step())
        jax.profiler.stop_trace()
        print(f"# trace captured to {args.profile}")

    # ---- components on ONE expert / ONE episode ----
    e0 = jax.tree.map(lambda a: a[0], variables["params"]["experts"])
    bg0 = variables["params"].get("bg_mlp")
    aabb0 = variables["buffers"]["expert_aabbs"][0]
    occ0 = jax.tree.map(lambda a: a[0], occ_states)
    sr = batch["support_rays"][0, 0]
    sg = batch["support_rgbs"][0, 0]

    episode_loss, prep = make_episode_loss(cfg, P, occ_cfg)

    march_j = jax.jit(
        lambda occ, r, k: occ_grid.march_rays(
            occ, r, occ_cfg, int(P.occ_s_max), int(P.occ_s_kept), key=k)
    )
    results["march"] = _time(
        lambda: march_j(occ0, sr, key)["positions"], iters=args.iters, label="march")
    smp = march_j(occ0, sr, key)

    fwd_j = jax.jit(
        lambda p, b, smp, k: episode_loss(p, b, aabb0, occ0, sr, sg, k,
                                          samples=smp))
    results["episode_fwd"] = _time(
        lambda: fwd_j(e0, bg0, smp, key), iters=args.iters, label="episode_fwd")

    # return the grads too — indexing [0] inside jit lets XLA DCE the
    # entire backward pass and "measure" a forward
    grad_j = jax.jit(
        lambda p, b, smp, k: jax.value_and_grad(episode_loss)(
            p, b, aabb0, occ0, sr, sg, k, samples=smp)
    )
    results["episode_grad"] = _time(
        lambda: grad_j(e0, bg0, smp, key), iters=args.iters, label="episode_grad")

    # K-vmapped episode grad — the actual per-unit shape inside the step
    # (4 experts march+render different occupancy states concurrently)
    eK = variables["params"]["experts"]
    aabbsK = variables["buffers"]["expert_aabbs"]
    srK = batch["support_rays"][:, 0]
    sgK = batch["support_rgbs"][:, 0]

    def one_expert(p, ab, occ, r, t, k):
        smp_k = prep(occ, r, k)
        return jax.value_and_grad(episode_loss)(
            p, bg0, ab, occ, r, t, k, samples=smp_k)

    gradK_j = jax.jit(
        lambda ps, abs_, occs, rs, ts, k: jax.vmap(
            one_expert, in_axes=(0, 0, 0, 0, 0, None)
        )(ps, abs_, occs, rs, ts, k)
    )
    results["episode_grad_K"] = _time(
        lambda: gradK_j(eK, aabbsK, occ_states, srK, sgK, key),
        iters=args.iters, label="episode_grad_K")

    # ---- hash encode alone at episode scale (S×s_kept points) ----
    n_pts = S * int(P.occ_s_kept)
    x01 = jnp.asarray(rng.uniform(0, 1, (n_pts, 3)).astype(np.float32))
    tables = e0["hash_table"]
    if P.use_amp:
        tables_b = jax.tree.map(lambda t: t.astype(jnp.bfloat16), tables)
    else:
        tables_b = tables

    hf_j = jax.jit(lambda t, x: hash_encode(t, x, hash_cfg).sum())
    results["hash_fwd"] = _time(lambda: hf_j(tables_b, x01), iters=args.iters, label="hash_fwd")

    hg_j = jax.jit(jax.grad(lambda t, x: hash_encode(t, x, hash_cfg).sum()))
    results["hash_grad"] = _time(
        lambda: jax.tree.leaves(hg_j(tables_b, x01))[0], iters=args.iters, label="hash_grad")

    # ---- full expert net fwd+bwd at episode point count (hash + MLP) ----
    from acn_tpu.models import ngp

    xd_pts = jnp.concatenate(
        [x01 * 2.0 - 1.0,
         jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n_pts, 3))], axis=-1)

    def expert_loss(p):
        out = ngp.ngp_forward(p, cfg.expert, aabb, xd_pts)
        return out.astype(jnp.float32).sum()

    mlp_j = jax.jit(jax.grad(expert_loss))
    results["expert_grad"] = _time(
        lambda: jax.tree.leaves(mlp_j(e0))[0], iters=args.iters, label="expert_grad")

    # ---- optimizer update alone ----
    g0 = jax.tree.map(jnp.zeros_like, variables["params"])
    opt_j = jax.jit(
        lambda g, s, p: opt.update(g, s, p)[0]
    )
    results["opt_update"] = _time(
        lambda: jax.tree.leaves(opt_j(g0, state["opt_state"],
                                      variables["params"]))[0],
        iters=args.iters, label="opt_update")

    # ---- decomposition ----
    n_units = T * INNER + T          # sequential K-wide fwd+bwd units
    pred = (
        n_units * results["episode_grad_K"]  # march included in the unit
        + results["opt_update"]
    )
    rows_per_episode = n_pts * hash_cfg.levels

    print("\n=== occ meta-step decomposition (v5e 1 chip) ===")
    for k in ("full_step", "march", "episode_fwd", "episode_grad",
              "episode_grad_K", "hash_fwd", "hash_grad", "expert_grad",
              "opt_update"):
        print(f"{k:>14}: {results[k] * 1e3:10.1f} ms")
    print(f"\nper-episode hash rows (S·s_kept·L): {rows_per_episode / 1e6:.1f} M")
    print(f"hash_fwd gather rate: {rows_per_episode / results['hash_fwd'] / 1e6:8.1f} M rows/s")
    print(f"hash_grad row rate (3× rows: fwd + re-gather + scatter): "
          f"{3 * rows_per_episode / results['hash_grad'] / 1e6:8.1f} M rows/s")
    print(f"\npredicted step (episodes/K + march + opt): {pred:.2f} s")
    print(f"measured  step: {results['full_step']:.2f} s "
          f"(slack ×{results['full_step'] / max(pred, 1e-9):.2f})")
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
