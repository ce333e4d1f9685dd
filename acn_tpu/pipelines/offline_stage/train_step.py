"""One meta-training step, fully jitted: vmap over tasks × stacked experts.

TPU-native counterpart of the reference's
``pipelines/offline_stage/meta_train_step.py``. The reference iterates regions
and tasks in Python (meta_train_step.py:60-123, one GPU, sequential); here the
whole step — episodic inner loops, query losses, outer gradient, optimizer
update — is a single XLA program:

* tasks vmap along T;
* experts are **stacked** along K and vmapped; under a device mesh the K axis
  is sharded (``expert`` axis) so each device trains its own experts' tasks,
  and the only cross-expert communication is the all-reduce of the shared
  background-MLP gradient (inserted automatically by partitioning);
* outer loss = Σ_regions mean_tasks(query loss): with fixed task shapes this
  equals the reference's ray-weighted sum × num_regions fed-avg scaling
  (meta_train_step.py:125-162).

Note: the reference's Reptile branch silently updates nothing in the MoE path
(its fast-weight keys are submodule-relative while ``snapshot_params`` uses
container-qualified names — meta_core.py:144-178 matches zero keys). Here
Reptile works per expert as intended.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.nerfs.losses import aligned_mse_loss, psnr_from_mse
from acn_tpu.nerfs.render import bg_default_color, render_rays_stratified
from acn_tpu.nerfs.render import (
    composite,
    composite_packed,
    render_weights_from_density,
)
from acn_tpu.occupancy import grid as occ_grid
from acn_tpu.occupancy.grid import OccConfig
from acn_tpu.pipelines.offline_stage import meta_core

Array = jnp.ndarray


def make_bg_fn(cfg: ContainerConfig, P) -> Callable:
    """(bg_params, dirs (N,3), key) → (N,3) background RGB."""
    if cfg.use_bg_nerf:

        def bg_fn(bg_params, dirs, key):
            variables = {"params": {"bg_mlp": bg_params}}
            return cont.background_color(variables, cfg, dirs)

    else:
        policy = P.bg_color_default

        def bg_fn(bg_params, dirs, key):
            if policy == "none":
                return None
            return bg_default_color(key, dirs.shape[0], policy)

    return bg_fn


def make_episode_loss(
    cfg: ContainerConfig,
    P,
    occ_cfg: Optional[OccConfig] = None,
    budget_override: Optional[int] = None,
    report_budget: int = 0,
):
    """Episode loss builder.

    Returns (loss_fn, prepare_samples):

    * loss(expert_params, bg_params, aabb, occ_state_or_None, rays, rgbs,
      key, samples=None) → scalar: render the rays with the given single
      expert (stratified while occupancy is not ready, occupancy-guided
      after) and align+MSE against GT (reference losses.py:10-32, render
      dispatch ray_rendering.py:564-574).
    * prepare_samples(occ_state, rays, key) → samples-or-None: the occupancy
      march for one episode's rays. Marching has no trainable inputs, so
      callers precompute it ONCE per episode and reuse it across all inner
      iterations (the reference re-marches every iteration only because
      nerfacc's CUDA sampler is cheap relative to its MLP; here the march is
      a measurable fraction of a step and the support rays are fixed).

    Memory: an episode is support_rays × ray_samples points — chip-saturating
    at reference scale — so rays render in fixed chunks via ``lax.map`` with
    per-chunk rematerialization (the TPU analogue of the reference's
    ``chunk_points`` loop, ray_rendering.py:324-326): peak activation memory
    is one chunk's, forward and backward.
    """
    bg_fn = make_bg_fn(cfg, P)
    use_occ = occ_cfg is not None
    # 0 disables ray chunking (one fused render per episode). Enable for
    # memory-constrained configs; note deeply nested scan/map programs
    # compile slowly on TPU.
    chunk = int(getattr(P, "train_chunk_rays", 0) or 0)
    use_amp = bool(getattr(P, "use_amp", False))

    # budget_override lets the trainer's auto-regime controller build a
    # strided (0) and a budget (P-value) variant of the SAME config;
    # report_budget makes the strided variant measure the would-be
    # overflow so the controller knows when the budget path is safe.
    budget = (
        int(budget_override)
        if budget_override is not None
        else int(getattr(P, "occ_budget_per_ray", 0) or 0)
    )

    def prepare_samples(occ_state, rays, key):
        if not use_occ or (chunk > 0 and rays.shape[0] > chunk):
            return None  # chunked path re-marches per chunk
        if budget > 0:
            # global cross-ray sample budget: exactly N·budget model evals
            # for the whole episode (see occ_grid.march_rays_budget)
            return occ_grid.march_rays_budget(
                occ_state, rays, occ_cfg, int(P.occ_s_max), budget, key=key
            )
        return occ_grid.march_rays(
            occ_state, rays, occ_cfg, int(P.occ_s_max), int(P.occ_s_kept),
            key=key, report_budget=int(report_budget),
        )

    def render_chunk(expert_params, aabb, occ_state, rays, bg, key, samples=None):
        """(chunk, 8) rays → (chunk, 3) rgb."""
        if use_amp:
            # bf16 compute (the TPU analogue of the reference's fp16
            # autocast inner loops, meta_core.py:31-47): params and network
            # inputs cast to bf16 — gathers and MXU matmuls run at half the
            # bandwidth — while t-sampling, compositing and the loss stay
            # fp32. Grads upcast through the casts onto fp32 masters.
            expert_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                expert_params,
            )
            fwd = lambda xd: cfg.expert_forward(
                expert_params, cfg.expert, aabb, xd.astype(jnp.bfloat16)
            ).astype(jnp.float32)
        else:
            fwd = lambda xd: cfg.expert_forward(expert_params, cfg.expert, aabb, xd)

        if not use_occ:
            rgb_map, _, _, _ = render_rays_stratified(
                fwd, rays, int(P.ray_samples), key=key, randomized=True,
                bg_rgb=bg,
            )
        else:
            if samples is None:
                samples = occ_grid.march_rays(
                    occ_state, rays, occ_cfg,
                    int(P.occ_s_max), int(P.occ_s_kept), key=key,
                )
            if "xd" in samples:  # global-budget layout — packed compositing
                out_buf = fwd(samples["xd"])  # (B, 4)
                rgb_map, _, _, _ = composite_packed(
                    out_buf[..., 3], out_buf[..., :3], samples,
                    rays.shape[0], bg_rgb=bg,
                )
            else:
                x = samples["positions"]
                d = jnp.broadcast_to(rays[:, None, 3:6], x.shape)
                xd = jnp.concatenate([x, d], axis=-1).reshape(-1, 6)
                out = fwd(xd).reshape(x.shape[0], x.shape[1], 4)
                weights, _ = render_weights_from_density(
                    samples["t_starts"], samples["t_ends"], out[..., 3],
                    sample_mask=samples["mask"], dts=samples["dts"],
                )
                t_mid = 0.5 * (samples["t_starts"] + samples["t_ends"])
                rgb_map, _, _ = composite(
                    weights, out[..., :3], t_mid, bg_rgb=bg
                )
        return rgb_map

    def loss_fn(expert_params, bg_params, aabb, occ_state, rays, rgbs, key,
                samples=None):
        n = rays.shape[0]
        k_render, k_bg = jax.random.split(key)
        bg = bg_fn(bg_params, rays[:, 3:6], k_bg)

        if chunk <= 0 or n <= chunk:
            rgb_map = render_chunk(
                expert_params, aabb, occ_state, rays, bg, k_render,
                samples=samples,
            )
            return aligned_mse_loss(rgb_map, rgbs, P.color_space)

        c = -(-n // chunk)  # ceil
        pad = c * chunk - n
        rays_p = jnp.concatenate(
            [rays, jnp.zeros((pad, 8), rays.dtype).at[:, 7].set(-1.0)], axis=0
        )
        bg_p = (
            jnp.concatenate([bg, jnp.zeros((pad, 3), bg.dtype)], axis=0)
            if bg is not None
            else None
        )
        keys = jax.random.split(k_render, c)

        def one(args):
            r, b, k = args
            return render_chunk(expert_params, aabb, occ_state, r, b, k)

        rgb_map = jax.lax.map(
            jax.checkpoint(one),
            (
                rays_p.reshape(c, chunk, 8),
                (bg_p.reshape(c, chunk, 3) if bg_p is not None else
                 jnp.zeros((c, chunk, 3), rays.dtype)),
                keys,
            ),
        ).reshape(c * chunk, 3)[:n]
        return aligned_mse_loss(rgb_map, rgbs, P.color_space)

    return loss_fn, prepare_samples


def _meta_grads_gradbased(
    episode_loss, prep, algo, params, bufs, occ_states, batch, key,
    inner_lr, inner_iter, fim_cfg=None,
):
    """MAML/FoMAML meta-gradients, scan-over-tasks with grad accumulation.

    Memory design: one task's episode already saturates the chip
    (support_rays × ray_samples points), so tasks run *sequentially* per
    expert (lax.scan) and only their gradients accumulate — the reference
    does the same sequentially in Python (meta_train_step.py:60-123). The
    K experts stay vmapped (that axis shards across the mesh). Each task's
    outer grad w.r.t. (expert params, shared bg) comes from one
    value_and_grad; grad of the mean = mean of grads.

    Returns (q_losses (K, T), inner_losses (K, T, I),
             expert_grads stacked (K, ...), bg_grad summed over K or None).
    """
    experts = params["experts"]
    bg = params.get("bg_mlp")
    aabbs = bufs["expert_aabbs"]
    outer_fn = meta_core.outer_loss_fn_for(algo)
    has_bg = bg is not None

    K, T = batch["support_rays"].shape[:2]
    keys = jax.random.split(key, K * T).reshape(K, T, -1)

    def task_grad(expert_p, aabb, occ_state, sr, sg, qr, qg, k):
        # marching is param-free: march support/query rays ONCE per episode
        # and reuse the samples across all inner iterations (None when the
        # stratified path is active)
        k, k_ms, k_mq = jax.random.split(k, 3)
        smp_s = prep(occ_state, sr, k_ms)
        smp_q = prep(occ_state, qr, k_mq)
        # budget-path overflow: fraction of valid samples dropped tail-first
        # because the cross-ray budget was undersized — silent gradient bias
        # unless surfaced (ADVICE r2)
        ovf = sum(
            s["overflow"]
            for s in (smp_s, smp_q)
            if isinstance(s, dict) and "overflow" in s
        ) * 0.5

        if algo == "fomaml":
            # Explicit first-order meta-gradient: adapt WITHOUT building any
            # outer differentiation through the inner scan (d fast/dθ = I),
            # then one fwd+bwd on the query at the adapted weights. This is
            # exactly the reference's create_graph=False semantics
            # (meta_core.py:52-64) and costs 8×(support fwd+bwd) + 1×(query
            # fwd+bwd) — nothing more.
            sup = lambda p, b, kk: episode_loss(
                p, bg, aabb, occ_state, b[0], b[1], kk, samples=smp_s
            )
            k_in, k_q = jax.random.split(k)
            if fim_cfg is not None:
                # Fisher-preconditioned inner SGD (--fim; the reference
                # scaffolds this in losses.py:35-151 but never wires it)
                from acn_tpu.models import fim as fim_mod

                fast, _, inner_losses = fim_mod.fim_task_adapt(
                    sup, jax.lax.stop_gradient(expert_p),
                    fim_mod.fisher_init(expert_p), (sr, sg), k_in,
                    inner_lr, inner_iter, **fim_cfg,
                )
            else:
                fast, inner_losses = meta_core.task_adapt(
                    sup, jax.lax.stop_gradient(expert_p), (sr, sg), k_in,
                    inner_lr, inner_iter, first_order=True,
                )

            def q_loss_fn(ep, bp):
                return episode_loss(
                    ep, bp, aabb, occ_state, qr, qg, k_q, samples=smp_q
                )

            argnums = (0, 1) if has_bg else (0,)
            q_loss, grads = jax.value_and_grad(q_loss_fn, argnums=argnums)(fast, bg)
            g_e = grads[0]
            g_b = grads[1] if has_bg else None
            return q_loss, inner_losses, g_e, g_b, ovf

        def outer(ep, bp):
            sup = lambda p, b, kk: episode_loss(
                p, bp, aabb, occ_state, b[0], b[1], kk, samples=smp_s
            )
            qry = lambda p, b, kk: episode_loss(
                p, bp, aabb, occ_state, b[0], b[1], kk, samples=smp_q
            )
            return outer_fn(
                sup, qry, ep, (sr, sg), (qr, qg), k, inner_lr, inner_iter
            )

        argnums = (0, 1) if has_bg else (0,)
        (q_loss, inner_losses), grads = jax.value_and_grad(
            outer, argnums=argnums, has_aux=True
        )(expert_p, bg)
        g_e = grads[0]
        g_b = grads[1] if has_bg else None
        return q_loss, inner_losses, g_e, g_b, ovf

    def per_expert(expert_p, aabb, occ_state, sr, sg, qr, qg, ks):
        g_e0 = jax.tree.map(jnp.zeros_like, expert_p)
        g_b0 = jax.tree.map(jnp.zeros_like, bg) if has_bg else 0.0

        def body(carry, xs):
            g_e_acc, g_b_acc = carry
            sr_t, sg_t, qr_t, qg_t, k_t = xs
            q_loss, inner_losses, g_e, g_b, ovf = task_grad(
                expert_p, aabb, occ_state, sr_t, sg_t, qr_t, qg_t, k_t
            )
            g_e_acc = jax.tree.map(jnp.add, g_e_acc, g_e)
            if has_bg:
                g_b_acc = jax.tree.map(jnp.add, g_b_acc, g_b)
            return (g_e_acc, g_b_acc), (q_loss, inner_losses, ovf)

        (g_e_sum, g_b_sum), (q_losses, inner_losses, ovfs) = jax.lax.scan(
            body, (g_e0, g_b0), (sr, sg, qr, qg, ks)
        )
        inv_t = 1.0 / T
        g_e_mean = jax.tree.map(lambda g: g * inv_t, g_e_sum)
        g_b_mean = jax.tree.map(lambda g: g * inv_t, g_b_sum) if has_bg else 0.0
        return q_losses, inner_losses, g_e_mean, g_b_mean, ovfs

    q_losses, inner_losses, g_experts, g_bg_per_k, ovfs = jax.vmap(per_expert)(
        experts,
        aabbs,
        occ_states,
        batch["support_rays"],
        batch["support_rgbs"],
        batch["query_rays"],
        batch["query_rgbs"],
        keys,
    )
    # shared bg: Σ_regions of per-region mean grads (matches the fed-avg
    # scaled outer loss Σ_k mean_t); this sum is the one cross-expert
    # collective under sharding
    g_bg = (
        jax.tree.map(lambda g: jnp.sum(g, axis=0), g_bg_per_k) if has_bg else None
    )
    return q_losses, inner_losses, g_experts, g_bg, jnp.mean(jnp.asarray(ovfs))


def _fim_cfg_from(P):
    """kwargs for fim_task_adapt when --fim is set, else None."""
    if not bool(getattr(P, "fim", False)):
        return None
    return dict(
        beta=float(getattr(P, "fim_beta", 0.95)),
        lam=float(getattr(P, "fim_lambda", 0.1)),
        epsilon=float(getattr(P, "fim_epsilon", 1e-6)),
    )


def make_device_batch_fn(T: int, S: int, Q: int, constraints=None):
    """Jittable episodic batch sampling from device-resident pools
    (see acn_tpu.data.tasks.build_device_pools).

    (pools, key) → stacked (K, T, ·, ·) batch, same layout as
    MultiTaskSampler.sample_batch — interchangeable with host sampling.

    Static-shape reproduction of the reference's episode constraints
    (task_dataset.py:420-542, 682-898): per split, a random subset of the
    cell's images (support ∈ [2,8], query ∈ [1,4]) sampled through a random
    image permutation; per-image shares bounded by image_cap via a
    cumsum-greedy fill; query images are the permutation slots AFTER the
    support slots (image-disjoint until exhausted, then borrowing — borrowed
    images read a circular window starting where support's stopped, keeping
    S/Q rays disjoint). Within-image windows index pre-shuffled segments, so
    every split is without-replacement per image.
    """
    from acn_tpu.data.tasks import EpisodeConstraints

    cst = constraints or EpisodeConstraints()
    cap_s = max(1, int(np.ceil(cst.image_cap * S)))
    cap_q = max(1, int(np.ceil(cst.image_cap * Q)))

    def sample_batch(pools, key):
        K = pools["rays"].shape[0]
        I = pools["img_start"].shape[2]
        keys = jax.random.split(key, K * T).reshape(K, T, -1)

        def split_take(lens_perm, n_use, target, cap):
            """Greedy capped allocation over image slots: slot i (< n_use)
            takes min(remaining, cap, len_i). Returns (take (I,), bounds)."""
            desired = jnp.where(
                jnp.arange(I) < n_use, jnp.minimum(lens_perm, cap), 0
            )
            before = jnp.cumsum(desired) - desired
            take = jnp.clip(target - before, 0, desired)
            bounds = jnp.cumsum(take)
            return take, bounds

        def gather_split(j, bounds, take, starts_perm, lens_perm, offs, pidx_c):
            """Map ray index j ∈ [0, target) to a pooled ray id."""
            total = jnp.maximum(bounds[-1], 1)
            jm = j % total
            slot = jnp.sum(jm[:, None] >= bounds[None, :], axis=1)  # (target,)
            rank = jm - (bounds[slot] - take[slot])
            ln = jnp.maximum(lens_perm[slot], 1)
            pos = starts_perm[slot] + (offs[slot] + rank) % ln
            return pidx_c[pos]

        def one_task(rays_k, rgbs_k, pidx_k, istart_k, ilen_k, icount_k,
                     elig_k, k):
            ks = jax.random.split(k, 6)
            # uniform choice among eligible cells
            logits = jnp.where(elig_k, 0.0, -jnp.inf)
            c = jax.random.categorical(ks[0], logits)
            n_img = jnp.maximum(icount_k[c], 1)

            # random permutation of the cell's valid image slots
            slot_ids = jnp.arange(I)
            rkeys = jax.random.uniform(ks[1], (I,)) + (slot_ids >= n_img) * 1e9
            order = jnp.argsort(rkeys)  # first n_img = valid slots, shuffled
            starts_p = istart_k[c][order]
            lens_p = ilen_k[c][order]

            # support: as many images as allowed (reference
            # _choose_images_for_split takes k = min(Kmax, available),
            # task_dataset.py:456-459; the minimum only gates borrowing)
            n_s = jnp.minimum(cst.max_images_support, n_img)
            take_s, bounds_s = split_take(lens_p, n_s, S, cap_s)
            offs_s = jax.random.randint(ks[3], (I,), 0, 1 << 30) % jnp.maximum(
                lens_p, 1
            )
            s_ids = gather_split(
                jnp.arange(S), bounds_s, take_s, starts_p, lens_p, offs_s,
                pidx_k[c],
            )

            # query: the NEXT permutation slots (image-disjoint from support
            # when enough images remain; otherwise borrow only to reach the
            # minimum — reference task_dataset.py:436-483)
            n_disj = jnp.maximum(n_img - n_s, 0)
            n_q = jnp.where(
                n_disj >= cst.min_images_query,
                jnp.minimum(cst.max_images_query, n_disj),
                jnp.minimum(cst.min_images_query, n_img),
            )
            qsrc = (n_s + slot_ids) % n_img  # position in `order` per q-slot
            borrowed = (n_s + slot_ids) >= n_img
            starts_q = starts_p[qsrc]
            lens_raw = lens_p[qsrc]
            lens_q = jnp.where(
                borrowed, jnp.maximum(lens_raw - take_s[qsrc], 0), lens_raw
            )
            take_q, bounds_q = split_take(lens_q, n_q, Q, cap_q)
            offs_fresh = jax.random.randint(
                ks[5], (I,), 0, 1 << 30
            ) % jnp.maximum(lens_q, 1)
            # borrowed images continue right after support's circular window
            offs_q = jnp.where(
                borrowed, (offs_s[qsrc] + take_s[qsrc]) % jnp.maximum(lens_raw, 1),
                offs_fresh,
            )
            q_ids = gather_split(
                jnp.arange(Q), bounds_q, take_q, starts_q,
                jnp.where(borrowed, lens_raw, lens_q), offs_q, pidx_k[c],
            )

            return rays_k[s_ids], rgbs_k[s_ids], rays_k[q_ids], rgbs_k[q_ids]

        def per_expert(rays_k, rgbs_k, pidx_k, istart_k, ilen_k, icount_k,
                       elig_k, ks):
            return jax.vmap(
                lambda kk: one_task(
                    rays_k, rgbs_k, pidx_k, istart_k, ilen_k, icount_k,
                    elig_k, kk,
                )
            )(ks)

        sr, sg, qr, qg = jax.vmap(per_expert)(
            pools["rays"], pools["rgbs"], pools["pool_idx"],
            pools["img_start"], pools["img_len"], pools["img_count"],
            pools["eligible"], keys,
        )
        return {
            "support_rays": sr,
            "support_rgbs": sg,
            "query_rays": qr,
            "query_rgbs": qg,
        }

    return sample_batch


def make_meta_train_step(
    cfg: ContainerConfig,
    P,
    optimizer: optax.GradientTransformation,
    occ_cfg: Optional[OccConfig] = None,
    budget_override: Optional[int] = None,
    report_budget: int = 0,
):
    """Build the jitted meta-train step.

    state = {"variables", "opt_state", "step"}; batch = stacked (K, T, ·, ·)
    episode arrays; occ_states = stacked per-expert occupancy pytree or None.

    Returns (state, metrics) with metrics {loss_out, loss_in, psnr_out,
    psnr_in, grad_norm} — the reference's per-region scalars
    (meta_train_step.py:193-253). ``budget_override``/``report_budget``
    build the auto-regime variants (see make_episode_loss)."""
    episode_loss, prep = make_episode_loss(
        cfg, P, occ_cfg,
        budget_override=budget_override, report_budget=report_budget,
    )
    algo = P.algo.lower()
    inner_lr = float(P.inner_lr)
    inner_iter = int(P.inner_iter)
    fim_cfg = _fim_cfg_from(P)
    if fim_cfg is not None and algo == "maml":
        raise ValueError(
            "--fim is a first-order preconditioner; use --algo fomaml"
        )

    if algo in ("maml", "fomaml"):

        def train_step(state, batch, occ_states, key):
            variables = state["variables"]
            bufs = variables["buffers"]

            q_losses, inner_losses, g_experts, g_bg, occ_overflow = _meta_grads_gradbased(
                episode_loss, prep, algo, variables["params"], bufs, occ_states,
                batch, key, inner_lr, inner_iter, fim_cfg=fim_cfg,
            )
            # Σ_regions mean_tasks — the fed-avg ×K scaling (see module doc)
            loss = jnp.sum(jnp.mean(q_losses, axis=1))
            grads = {"experts": g_experts}
            if g_bg is not None:
                grads["bg_mlp"] = g_bg

            updates, opt_state = optimizer.update(
                grads, state["opt_state"], variables["params"]
            )
            new_params = optax.apply_updates(variables["params"], updates)

            new_state = {
                "variables": {"params": new_params, "buffers": bufs},
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }
            loss_in_last = inner_losses[..., -1]  # (K, T)
            metrics = {
                "loss_out": jnp.mean(q_losses, axis=1),  # (K,)
                "loss_in": jnp.mean(loss_in_last, axis=1),  # (K,)
                "psnr_out": psnr_from_mse(jnp.mean(q_losses, axis=1)),
                "psnr_in": psnr_from_mse(jnp.mean(loss_in_last, axis=1)),
                "loss_total": loss,
                "grad_norm": meta_core.global_grad_norm(grads),
                "occ_overflow": occ_overflow,
            }
            return new_state, metrics

    elif algo == "reptile":
        outer_lr = float(P.lr)

        def train_step(state, batch, occ_states, key):
            variables = state["variables"]
            bufs = variables["buffers"]
            params = variables["params"]
            experts = params["experts"]
            bg = params.get("bg_mlp")
            aabbs = bufs["expert_aabbs"]

            K, T = batch["support_rays"].shape[:2]
            keys = jax.random.split(key, K * T).reshape(K, T, -1)

            def per_task(expert_p, aabb, occ_state, sr, sg, qr, qg, k):
                k_in, k_q, k_ms, k_mq = jax.random.split(k, 4)
                smp_s = prep(occ_state, sr, k_ms)
                smp_q = prep(occ_state, qr, k_mq)
                ovf = sum(
                    s["overflow"]
                    for s in (smp_s, smp_q)
                    if isinstance(s, dict) and "overflow" in s
                ) * 0.5
                sup_loss = lambda p, b, kk: episode_loss(
                    p, bg, aabb, occ_state, b[0], b[1], kk, samples=smp_s
                )
                fast, inner_losses = meta_core.reptile_adapt(
                    sup_loss, expert_p, (sr, sg), k_in, inner_lr, inner_iter
                )
                q_loss = episode_loss(
                    fast, bg, aabb, occ_state, qr, qg, k_q, samples=smp_q
                )
                return fast, q_loss, inner_losses, ovf

            def per_expert(expert_p, aabb, occ_state, sr, sg, qr, qg, ks):
                # tasks sequential (one episode saturates the chip);
                # accumulate Σ(fast − θ) instead of stacking fasts
                d0 = jax.tree.map(jnp.zeros_like, expert_p)

                def body(d_acc, xs):
                    sr_t, sg_t, qr_t, qg_t, k_t = xs
                    fast, q_loss, inner_losses, ovf = per_task(
                        expert_p, aabb, occ_state, sr_t, sg_t, qr_t, qg_t, k_t
                    )
                    d_acc = jax.tree.map(
                        lambda a, f, w: a + (f - w), d_acc, fast, expert_p
                    )
                    return d_acc, (q_loss, inner_losses, ovf)

                d_sum, (q_losses, inner_losses, ovfs) = jax.lax.scan(
                    body, d0, (sr, sg, qr, qg, ks)
                )
                T = sr.shape[0]
                delta = jax.tree.map(
                    lambda d: jnp.where(jnp.isfinite(d), d, 0.0) / T, d_sum
                )
                new_p = jax.tree.map(lambda w, d: w + outer_lr * d, expert_p, delta)
                return new_p, q_losses, inner_losses, ovfs

            new_experts, q_losses, inner_losses, ovfs = jax.vmap(per_expert)(
                experts,
                aabbs,
                occ_states,
                batch["support_rays"],
                batch["support_rgbs"],
                batch["query_rays"],
                batch["query_rgbs"],
                keys,
            )

            new_params = dict(params)
            new_params["experts"] = new_experts
            new_state = {
                "variables": {"params": new_params, "buffers": bufs},
                "opt_state": state["opt_state"],
                "step": state["step"] + 1,
            }
            loss_in_last = inner_losses[..., -1]
            metrics = {
                "loss_out": jnp.mean(q_losses, axis=1),
                "loss_in": jnp.mean(loss_in_last, axis=1),
                "psnr_out": psnr_from_mse(jnp.mean(q_losses, axis=1)),
                "psnr_in": psnr_from_mse(jnp.mean(loss_in_last, axis=1)),
                "loss_total": jnp.sum(jnp.mean(q_losses, axis=1)),
                "grad_norm": jnp.zeros(()),
                "occ_overflow": jnp.mean(jnp.asarray(ovfs)),
            }
            return new_state, metrics

    else:
        raise ValueError(f"Unsupported algo {algo!r}")

    return train_step


def make_eval_step(
    cfg: ContainerConfig,
    P,
    occ_cfg: Optional[OccConfig] = None,
    tto: Optional[int] = None,
):
    """Mid-training eval (reference meta_eval_step.py:16-148): adapt each test
    task with ``tto`` inner steps, return post-adaptation query PSNR per
    region. Batch layout identical to the train step."""
    episode_loss, prep = make_episode_loss(cfg, P, occ_cfg)
    inner_lr = float(P.inner_lr)
    iterations = int(P.inner_iter if tto is None else tto)
    fim_cfg = _fim_cfg_from(P)

    def eval_step(variables, batch, occ_states, key):
        bufs = variables["buffers"]
        params = variables["params"]
        experts = params["experts"]
        bg = params.get("bg_mlp")
        aabbs = bufs["expert_aabbs"]

        K, T = batch["support_rays"].shape[:2]
        keys = jax.random.split(key, K * T).reshape(K, T, -1)

        def per_task(expert_p, aabb, occ_state, sr, sg, qr, qg, k):
            k_in, k_q, k_ms, k_mq = jax.random.split(k, 4)
            smp_s = prep(occ_state, sr, k_ms)
            smp_q = prep(occ_state, qr, k_mq)
            sup_loss = lambda p, b, kk: episode_loss(
                p, bg, aabb, occ_state, b[0], b[1], kk, samples=smp_s
            )
            if iterations > 0:
                if fim_cfg is not None:
                    from acn_tpu.models import fim as fim_mod

                    fast, _, _ = fim_mod.fim_task_adapt(
                        sup_loss, expert_p, fim_mod.fisher_init(expert_p),
                        (sr, sg), k_in, inner_lr, iterations, **fim_cfg,
                    )
                else:
                    fast, _ = meta_core.task_adapt(
                        sup_loss, expert_p, (sr, sg), k_in, inner_lr, iterations,
                        first_order=True,
                    )
            else:
                fast = expert_p
            return episode_loss(
                fast, bg, aabb, occ_state, qr, qg, k_q, samples=smp_q
            )

        def per_expert(expert_p, aabb, occ_state, sr, sg, qr, qg, ks):
            return jax.lax.map(
                lambda xs: per_task(expert_p, aabb, occ_state, *xs),
                (sr, sg, qr, qg, ks),
            )

        q_losses = jax.vmap(per_expert)(
            experts, aabbs, occ_states,
            batch["support_rays"], batch["support_rgbs"],
            batch["query_rays"], batch["query_rgbs"], keys,
        )  # (K, T)
        psnr_region = psnr_from_mse(jnp.mean(q_losses, axis=1))
        return {
            "loss_out": jnp.mean(q_losses, axis=1),
            "psnr_out": psnr_region,
            "psnr": psnr_from_mse(jnp.mean(q_losses)),
        }

    return eval_step
