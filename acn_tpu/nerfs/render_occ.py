"""Occupancy-guided renderers: single expert and soft-MoE container.

TPU-native counterpart of the reference's ``render_rays_occ`` /
``render_expert_occ`` (nerfs/ray_rendering.py:349-558). The reference marches
each expert separately with nerfacc, merges the per-expert ragged segments
into a per-ray boundary union in a *Python loop over rays*
(ray_rendering.py:196-256 — its own hot-spot), then soft-blends σ and rgb at
segment midpoints before one packed integration.

Here the union is *by construction*: all experts share one global cone-scaled
t-schedule per ray, each expert contributes occupancy/AABB validity at every
candidate sample, and a sample survives if any expert claims it. That is a
uniform quadrature of the same blended field — no double counting, no ragged
merge, one static-shape compositing pass:

    σ_mix(x)  = Σ_k w_k(x) σ_k(x)
    rgb_mix(x) = Σ_k w_k(x) σ_k(x) c_k(x) / σ_mix(x)      (σ-weighted blend,
                 matching reference ray_rendering.py:473-475)

Expert evaluation is dense over K (vmap) — with K small and soft boundaries
touching 2+ experts anyway, dense beats scatter/gather on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.nerfs.render import (
    composite,
    composite_packed,
    render_weights_from_density,
)
from acn_tpu.occupancy import grid as occ_grid
from acn_tpu.occupancy.grid import OccConfig

Array = jnp.ndarray


def render_expert_occ(
    variables: Dict[str, Any],
    occ_state: Dict[str, Any],  # single-expert occupancy state
    cfg: ContainerConfig,
    occ_cfg: OccConfig,
    rays: Array,  # (N, 8)
    *,
    active_module: int,
    s_max: int,
    s_kept: int,
    alpha_thre: float = 0.0,
    key: Optional[jax.Array] = None,
    bg_rgb: Optional[Array] = None,
    params_override=None,
) -> Tuple[Array, Array, Array, Array]:
    """Single-expert occupancy rendering (reference ray_rendering.py:494-558).

    Returns (rgb_map, depth, weights (N, s_kept), acc).
    """
    samples = occ_grid.march_rays(occ_state, rays, occ_cfg, s_max, s_kept, key=key)
    x = samples["positions"]  # (N, S, 3)
    d = jnp.broadcast_to(rays[:, None, 3:6], x.shape)
    xd = jnp.concatenate([x, d], axis=-1).reshape(-1, 6)

    out = cont.container_forward(
        variables, cfg, xd, active_module=active_module,
        params_override=params_override,
    ).reshape(x.shape[0], x.shape[1], 4)

    rgbs = out[..., :3]
    sigmas = out[..., 3]

    mask = samples["mask"]
    if alpha_thre > 0.0:
        dt = jnp.maximum(samples["dts"], 0.0)
        alpha = 1.0 - jnp.exp(-jnp.maximum(sigmas, 0.0) * dt)
        mask = mask & (alpha >= alpha_thre)

    weights, _ = render_weights_from_density(
        samples["t_starts"], samples["t_ends"], sigmas, sample_mask=mask,
        dts=samples["dts"],
    )
    t_mid = 0.5 * (samples["t_starts"] + samples["t_ends"])
    rgb_map, depth, acc = composite(weights, rgbs, t_mid, bg_rgb=bg_rgb)
    return rgb_map, depth, weights, acc



def render_expert_occ_budget(
    variables: Dict[str, Any],
    occ_state: Dict[str, Any],  # single-expert occupancy state
    cfg: ContainerConfig,
    occ_cfg: OccConfig,
    rays: Array,  # (N, 8)
    *,
    active_module: int,
    s_max: int,
    budget_per_ray: int,
    alpha_thre: float = 0.0,
    key: Optional[jax.Array] = None,
    bg_rgb: Optional[Array] = None,
    params_override=None,
    s_coarse: int = 0,
) -> Tuple[Array, Array, Array, Array]:
    """Single-expert occupancy rendering over a global cross-ray sample
    budget (the packed serving path of render_rays_occ_budget, restricted
    to one expert's own grid — reference single-expert render:
    ray_rendering.py:494-558). ``s_coarse`` enables the range-finding
    pre-pass on this expert's grid (occ_grid.coarse_ray_range) — the
    multi-expert union path can't use it (its schedule grid is a dummy;
    validity comes from the per-expert union), but here the grid is real.
    Returns (rgb_map, depth, extras, acc)."""
    samples = occ_grid.march_rays_budget(
        occ_state, rays, occ_cfg, s_max, budget_per_ray, key=key,
        s_coarse=s_coarse,
    )
    out = cont.container_forward(
        variables, cfg, samples["xd"], active_module=active_module,
        params_override=params_override,
    )
    rgb_map, depth, acc, extras = composite_packed(
        out[..., 3], out[..., :3], samples, rays.shape[0], bg_rgb=bg_rgb,
        alpha_thre=alpha_thre,
    )
    return rgb_map, depth, extras, acc


def _any_expert_valid_fn(occ_states, expert_aabbs):
    """(N, S, 3) → (N, S): a sample is valid if ANY expert's
    (AABB ∩ occupancy) claims it — the implicit segment union."""

    def any_expert_valid(x):
        def one(state_k, aabb_k):
            inside = sbox.within(aabb_k, x, inclusive=False)
            return inside & occ_grid.occupancy_lookup(state_k, x)

        per_k = jax.vmap(one)(occ_states, expert_aabbs)  # (K, N, S)
        return jnp.any(per_k, axis=0)

    return any_expert_valid


def _soft_moe_eval(variables, cfg, xd, params_override=None):
    """Dense per-expert evaluation + σ-weighted soft blend at flat points
    (reference ray_rendering.py:436-475). xd (M, 6) → (σ_mix (M,), rgb_mix
    (M, 3))."""
    bufs = variables["buffers"]
    expert_aabbs = bufs["expert_aabbs"]
    w = cont.routing_weights(
        bufs["centroids"], xd[:, :3], cfg.cluster_2d, cfg.boundary_margin
    )  # (M, K)
    experts = (
        params_override if params_override is not None
        else variables["params"]["experts"]
    )
    fwd = cfg.expert_forward
    outs = jax.vmap(lambda p, ab: fwd(p, cfg.expert, ab, xd))(
        experts, expert_aabbs
    )  # (K, M, 4)
    SIG = outs[..., 3].T  # (M, K)
    RGB = jnp.moveaxis(outs[..., :3], 0, 1)  # (M, K, 3)
    w = w.astype(SIG.dtype)
    s_num = jnp.maximum(jnp.sum(w * SIG, axis=1, keepdims=True), 1e-12)
    return s_num[:, 0], jnp.sum(w[..., None] * SIG[..., None] * RGB, axis=1) / s_num


def render_rays_occ_budget(
    variables: Dict[str, Any],
    occ_states: Dict[str, Any],  # stacked (K, ...) occupancy states
    cfg: ContainerConfig,
    occ_cfg: OccConfig,
    rays: Array,  # (N, 8)
    *,
    s_max: int,
    budget_per_ray: int,
    alpha_thre: float = 0.0,
    key: Optional[jax.Array] = None,
    bg_rgb: Optional[Array] = None,
    params_override=None,
) -> Tuple[Array, Array, Array, Array]:
    """Full-container occupancy rendering with a **global cross-ray sample
    budget** (see occ_grid.march_rays_budget): all experts evaluate exactly
    N·budget packed points instead of N·s_kept slots. For full frames —
    where sky/background rays have almost no occupied samples — this
    converts the frame's true sparsity into wall-clock. Compositing runs
    directly over the packed buffer (render.composite_packed) — O(B)
    segment scans instead of O(N·s_max) gathers.

    Returns (rgb_map, depth, extras {wmax, went} (N,), acc).
    """
    bufs = variables["buffers"]
    any_expert_valid = _any_expert_valid_fn(occ_states, bufs["expert_aabbs"])

    # dummy always-on grid over the GLOBAL aabb drives the schedule (its own
    # lookup must never cull — validity comes from the per-expert union)
    base_state = jax.tree.map(lambda a: a[0], occ_states)
    base_state = {
        **base_state,
        "binaries": jnp.ones_like(base_state["binaries"]),
        "aabbs": occ_grid.level_aabbs(
            bufs["global_aabb"], base_state["binaries"].shape[0]
        ),
    }
    samples = occ_grid.march_rays_budget(
        base_state, rays, occ_cfg, s_max, budget_per_ray, key=key,
        extra_valid_fn=any_expert_valid,
    )

    sigma_mix, rgb_mix = _soft_moe_eval(
        variables, cfg, samples["xd"], params_override
    )
    rgb_map, depth, acc, extras = composite_packed(
        sigma_mix, rgb_mix, samples, rays.shape[0], bg_rgb=bg_rgb,
        alpha_thre=alpha_thre,
    )
    return rgb_map, depth, extras, acc


def render_rays_occ(
    variables: Dict[str, Any],
    occ_states: Dict[str, Any],  # stacked (K, ...) occupancy states
    cfg: ContainerConfig,
    occ_cfg: OccConfig,
    rays: Array,  # (N, 8)
    *,
    s_max: int,
    s_kept: int,
    alpha_thre: float = 0.0,
    key: Optional[jax.Array] = None,
    bg_rgb: Optional[Array] = None,
    params_override=None,
) -> Tuple[Array, Array, Array, Array]:
    """Full-container occupancy rendering with soft-MoE blending
    (reference ray_rendering.py:349-491). ``occ_states`` is the per-expert
    occupancy pytree stacked along a leading K axis (aabbs included).

    Returns (rgb_map, depth, weights (N, s_kept), acc).
    """
    bufs = variables["buffers"]
    # Shared t-schedule over the global near/far; a candidate sample is valid
    # if ANY expert's (AABB ∩ occupancy) claims it.
    any_expert_valid = _any_expert_valid_fn(occ_states, bufs["expert_aabbs"])

    o, d = rays[:, :3], rays[:, 3:6]
    near = jnp.maximum(rays[:, 6], occ_cfg.near_plane)
    far = jnp.minimum(rays[:, 7], occ_cfg.far_plane)
    far = jnp.maximum(far, near)

    e = jnp.linspace(0.0, 1.0, s_max + 1, dtype=jnp.float32)[None, :]
    edges = near[:, None] * (1.0 - e) + far[:, None] * e
    t0, t1 = edges[:, :-1], edges[:, 1:]
    if key is not None:
        k_jit, k_phase = jax.random.split(key)
        u = jax.random.uniform(k_jit, t0.shape, dtype=jnp.float32)
    else:
        k_phase, u = None, 0.5
    t_s = t0 + u * (t1 - t0)
    x_all = o[:, None, :] + d[:, None, :] * t_s[..., None]

    valid = (t1 > t0) & any_expert_valid(x_all)
    idx, mask, scale = occ_grid.compact_samples_strided(valid, s_kept, key=k_phase)
    t0k = jnp.take_along_axis(t0, idx, axis=1)
    t1k = jnp.take_along_axis(t1, idx, axis=1)
    dts = (t1k - t0k) * scale[:, None]
    xk = jnp.take_along_axis(x_all, idx[..., None], axis=1)  # (N, S, 3)
    dk = jnp.broadcast_to(d[:, None, :], xk.shape)

    # soft routing + dense per-expert eval + σ-weighted blend at midpoints
    xd = jnp.concatenate([xk, dk], axis=-1).reshape(-1, 6)
    sigma_mix, rgb_mix = _soft_moe_eval(variables, cfg, xd, params_override)

    N, S = xk.shape[0], xk.shape[1]
    sigmas = sigma_mix.reshape(N, S)
    rgbs = rgb_mix.reshape(N, S, 3)

    if alpha_thre > 0.0:
        dt = jnp.maximum(dts, 0.0)
        alpha = 1.0 - jnp.exp(-jnp.maximum(sigmas, 0.0) * dt)
        mask = mask & (alpha >= alpha_thre)

    weights, _ = render_weights_from_density(
        t0k, t1k, sigmas, sample_mask=mask, dts=dts
    )
    t_mid = 0.5 * (t0k + t1k)
    rgb_map, depth, acc = composite(weights, rgbs, t_mid, bg_rgb=bg_rgb)
    return rgb_map, depth, weights, acc
