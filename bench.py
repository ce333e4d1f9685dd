#!/usr/bin/env python
"""Benchmark: meta-training throughput (ray-renders/sec) on real hardware.

Runs the full jitted FoMAML meta-train step — the reference's hot loop
(meta_train_step.py:18-253) — at the reference's default scale: 4 experts ×
3 tasks × (8 inner iterations × 4000 support rays + 2000 query rays), 96
samples/ray, Instant-NGP experts with a 2^19 hash table, and reports
ray-renders/second (one ray-render = one ray fully sampled + composited,
inner and query passes both counted, forward+backward included).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline divides by a
provisional estimate of the reference A100 pipeline's throughput
(~300k effective ray-renders/s from its default step budget at ~1.4s/step),
to be replaced by a measured value when one exists.
"""

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_ESTIMATE = 300_000.0


def main():
    import types

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _toy_problem
    from acn_tpu.models import container as cont
    from acn_tpu.pipelines.offline_stage.train_step import make_meta_train_step
    from acn_tpu.pipelines.offline_stage.trainer import dummy_occ_states
    from acn_tpu.utils.optim import build_optimizer

    K, T, S, Q = 4, 3, 4000, 2000
    INNER = 8
    RAY_SAMPLES = 96

    # cell-layout tables: 2^16 rows × 16 floats/level ≈ the reference's
    # 2^19-entry × 2-float corner tables in parameter capacity
    cfg, variables = _toy_problem(K=K, hash_log2=16, hash_levels=16)

    P = types.SimpleNamespace(
        algo="fomaml", inner_iter=INNER, inner_lr=0.015, ray_samples=RAY_SAMPLES,
        color_space="linear", bg_color_default="white", optimizer="adam",
        encoding_lr=1e-2, sigma_lr=2e-3, color_lr=2e-3, bg_lr=1e-3, lr=1e-4,
        outer_steps=10_000, decay_factor=10.0, no_scheduler=False, grad_clip=1.0,
        occ_s_max=512, occ_s_kept=128, use_amp=True, train_chunk_rays=0,
    )
    labels = cont.param_group_labels(variables, cfg)
    opt = build_optimizer(P, labels, grad_clip=P.grad_clip)
    step_fn = jax.jit(make_meta_train_step(cfg, P, opt), donate_argnums=(0,))

    state = {
        "variables": variables,
        "opt_state": opt.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    occ = dummy_occ_states(K)

    rng = np.random.default_rng(0)
    o = np.concatenate(
        [
            rng.uniform(-0.5, 0.5, (K, T, S + Q, 2)).astype(np.float32),
            np.full((K, T, S + Q, 1), 2.0, np.float32),
        ],
        axis=-1,
    )
    d = rng.normal(size=(K, T, S + Q, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[..., 2] = -np.abs(d[..., 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nf = np.concatenate(
        [np.full((K, T, S + Q, 1), 1.0, np.float32),
         np.full((K, T, S + Q, 1), 3.0, np.float32)],
        axis=-1,
    )
    rays = np.concatenate([o, d, nf], axis=-1)
    rgbs = rng.uniform(0, 1, (K, T, S + Q, 3)).astype(np.float32)
    batch = {
        "support_rays": jnp.asarray(rays[:, :, :S]),
        "support_rgbs": jnp.asarray(rgbs[:, :, :S]),
        "query_rays": jnp.asarray(rays[:, :, S:]),
        "query_rgbs": jnp.asarray(rgbs[:, :, S:]),
    }

    key = jax.random.PRNGKey(0)

    # warmup / compile (float() forces materialization — on the remote-TPU
    # tunnel platform block_until_ready alone does not synchronize)
    key, k = jax.random.split(key)
    state, metrics = step_fn(state, batch, occ, k)
    _ = float(metrics["loss_total"])

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, occ, k)
    _ = float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / iters

    rays_per_step = K * T * (INNER * S + Q)  # ray-renders per meta-step
    rays_per_sec = rays_per_step / dt

    print(
        json.dumps(
            {
                "metric": "meta_train_ray_renders_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
