"""Core volume rendering — static-shape, jit-first.

TPU-native counterpart of the reference's ``nerfs/ray_rendering.py``. The
reference has two sampling regimes: classical stratified ``(N, S)`` grids
(ray_rendering.py:262-345) and nerfacc's ragged packed samples for the
occupancy path (ray_rendering.py:477-487). Ragged layouts are the antithesis
of XLA, so here *everything* is a fixed ``(N, S)`` layout with a boolean
``sample_mask``: masked samples contribute zero alpha and fall out of the
compositing algebra exactly. The occupancy renderer (acn_tpu.occupancy) emits
such masked layouts directly.

All functions are pure; randomness comes from explicit PRNG keys.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from acn_tpu.models.trunc_exp import trunc_exp
from acn_tpu.ops.segscan import seg_excl_sum

Array = jnp.ndarray


# ============================ background helpers ============================


def bg_default_color(
    key: Optional[jax.Array],
    n: int,
    bg_color: str = "white",
    dtype=jnp.float32,
) -> Optional[Array]:
    """Deterministic fallback background color (reference
    ray_rendering.py:48-79). ``last_sample`` is handled by the caller."""
    if bg_color == "none":
        return None
    if bg_color == "white":
        return jnp.ones((n, 3), dtype=dtype)
    if bg_color == "black":
        return jnp.zeros((n, 3), dtype=dtype)
    if bg_color == "random":
        if key is None:
            raise ValueError("bg_color='random' needs a PRNG key")
        return jax.random.uniform(key, (n, 3), dtype=dtype)
    raise ValueError(f"Unknown background policy: {bg_color}")


def apply_bg_mask(rgb: Array, mask_invalid: Array, policy: str, key=None) -> Array:
    """Fill invalid rays with a background policy (functional version of
    reference ray_rendering.py:82-108)."""
    policy = str(policy).lower()
    if policy in ("none", "last_sample"):
        return rgb
    if policy == "white":
        fill = jnp.ones_like(rgb)
    elif policy == "black":
        fill = jnp.zeros_like(rgb)
    elif policy == "random":
        if key is None:
            raise ValueError("policy='random' needs a PRNG key")
        fill = jax.random.uniform(key, rgb.shape, dtype=rgb.dtype)
    else:
        fill = jnp.ones_like(rgb)
    return jnp.where(mask_invalid[:, None], fill, rgb)


# ============================ core compositing ============================


def volume_render(
    rgb_sigma: Array,  # (N, S, 4) [rgb in 0..1, sigma >= 0] unless raw_*
    t_vals: Array,  # (N, S)
    bg_rgb: Optional[Array] = None,  # (N, 3)
    *,
    raw_rgb: bool = False,
    raw_sigma: bool = False,
    sigma_scale: float = 1.0,
    sample_mask: Optional[Array] = None,  # (N, S) bool; False ⇒ zero alpha
) -> Tuple[Array, Array, Array, Array]:
    """Discrete transmittance integration (reference ray_rendering.py:114-165).

    α_i = 1 − exp(−σ_i Δ_i), T_i = Π_{j<i}(1 − α_j), w_i = α_i T_i;
    composite rgb / expected depth / opacity, optional bg compositing.

    Returns (rgb_map (N,3), depth_map (N,), weights (N,S), acc_map (N,)).
    """
    rgb_raw = rgb_sigma[..., :3]
    sigma_in = rgb_sigma[..., 3]

    rgb = jax.nn.sigmoid(rgb_raw) if raw_rgb else jnp.clip(rgb_raw, 0.0, 1.0)
    sigma = trunc_exp(sigma_in) if raw_sigma else jnp.maximum(sigma_in, 0.0)
    if sigma_scale != 1.0:
        sigma = sigma * float(sigma_scale)

    # Δ distances, finite last interval (same convention as the reference).
    dists = jnp.maximum(t_vals[:, 1:] - t_vals[:, :-1], 1e-4)
    dists = jnp.concatenate([dists, dists[:, -1:]], axis=1)

    if sample_mask is not None:
        sigma = jnp.where(sample_mask, sigma, 0.0)

    alpha = jnp.clip(1.0 - jnp.exp(-sigma * dists), 0.0, 1.0 - 1e-7)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_map = jnp.sum(weights * t_vals, axis=1)
    acc_map = jnp.sum(weights, axis=1)

    if bg_rgb is not None:
        rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bg_rgb.astype(rgb_map.dtype)

    return rgb_map, depth_map, weights, acc_map


def render_weights_from_density(
    t_starts: Array,  # (N, S)
    t_ends: Array,  # (N, S)
    sigmas: Array,  # (N, S)
    sample_mask: Optional[Array] = None,  # (N, S)
    dts: Optional[Array] = None,  # (N, S) interval-width override
) -> Tuple[Array, Array]:
    """Static-shape equivalent of nerfacc ``render_weight_from_density``
    (reference ray_rendering.py:477-481): per-sample weights from interval
    densities over a fixed layout. ``dts`` overrides the interval widths
    (the occupancy marcher pre-scales widths by its compaction stride).
    Returns (weights (N,S), trans (N,S))."""
    dt = jnp.maximum(t_ends - t_starts if dts is None else dts, 0.0)
    sigma = jnp.maximum(sigmas, 0.0)
    if sample_mask is not None:
        sigma = jnp.where(sample_mask, sigma, 0.0)
    alpha = 1.0 - jnp.exp(-sigma * dt)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
    return alpha * trans, trans


def composite_packed(
    sigmas_b: Array,  # (B,) densities at packed samples
    rgbs_b: Array,  # (B, 3)
    samples: dict,  # march_rays_budget output (t0_b/t1_b/ray_id/slot_real/ray_start)
    n_rays: int,
    bg_rgb: Optional[Array] = None,  # (N, 3)
    alpha_thre: float = 0.0,
) -> Tuple[Array, Array, Array, dict]:
    """Compositing directly over the ray-major packed sample buffer.

    The budget marcher packs every valid sample of the batch contiguously by
    ray (occupancy/grid.py march_rays_budget), so per-ray transmittance is a
    segment-exclusive product — computed as a *segmented* log-space scan that
    resets at every ray boundary — and per-ray accumulation is a B→N
    segment-sum (a scatter-add into a tiny target). Compared with scattering
    results back onto the dense (N, s_max) grid this removes an O(N·s_max)
    gather, its O(N·s_max) backward scatter, and all (N, s_max) compositing
    traffic: everything is O(B) + O(N).

    The scan must be segmented, not a global cumsum minus a per-ray base:
    opaque samples contribute ≈−23 each to log-transmittance, so a global
    float32 prefix over a serving-scale buffer (B ≈ 10⁶) reaches magnitudes
    where the ulp is 0.01–1.0 and exp(ce − base) for late rays is off by up
    to tens of percent. Resetting at each segment bounds the accumulated
    magnitude by one ray's own log-transmittance (≤ s_max·23 ≈ 1.5e3, ulp
    ≈ 1e-4), independent of buffer position.

    Returns (rgb_map (N,3), depth (N,), acc (N,), extras {wmax, went}) —
    extras are the per-ray weight-shape stats fog suppression needs
    (reference video_gen.py:329-363), computed as segment max / entropy.
    """
    t0_b, t1_b = samples["t0_b"], samples["t1_b"]
    rid = samples["ray_id"]
    real = samples["slot_real"]

    dt = jnp.maximum(t1_b - t0_b, 0.0)
    sigma = jnp.where(real, jnp.maximum(sigmas_b, 0.0), 0.0)
    alpha = 1.0 - jnp.exp(-sigma * dt)
    if alpha_thre > 0.0:
        alpha = jnp.where(alpha >= alpha_thre, alpha, 0.0)

    # segment-exclusive transmittance: Π_{j<i in ray}(1−α_j+ε) via a
    # segmented log-space scan (resets where ray_id changes; real samples are
    # a contiguous ray-major prefix, so rid transitions mark ray boundaries).
    # Backend: XLA associative_scan by default; ACN_TPU_SEGSCAN=pallas swaps
    # in the single-HBM-pass Mosaic kernel (ops/segscan.py).
    logt = jnp.log(1.0 - alpha + 1e-10)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), rid[1:] != rid[:-1]], axis=0)
    trans = jnp.exp(seg_excl_sum(logt, seg_start))  # exclusive within-ray
    w = jnp.where(real, alpha * trans, 0.0)

    rid_safe = jnp.where(real, rid, n_rays)  # padding → dropped
    rgb_map = (
        jnp.zeros((n_rays, 3), jnp.float32)
        .at[rid_safe].add((w[:, None] * rgbs_b).astype(jnp.float32), mode="drop")
    )
    t_mid = 0.5 * (t0_b + t1_b)
    depth = jnp.zeros((n_rays,), jnp.float32).at[rid_safe].add(
        w * t_mid, mode="drop")
    acc = jnp.zeros((n_rays,), jnp.float32).at[rid_safe].add(w, mode="drop")

    # weight-shape stats (segment forms of renderer.py's wmax / entropy)
    wmax = jnp.zeros((n_rays,), jnp.float32).at[rid_safe].max(w, mode="drop")
    wlogw = jnp.zeros((n_rays,), jnp.float32).at[rid_safe].add(
        w * jnp.log(jnp.maximum(w, 1e-12)), mode="drop")
    wsum = jnp.maximum(acc, 1e-12)
    went = jnp.log(wsum) - wlogw / wsum

    if bg_rgb is not None:
        rgb_map = rgb_map + (1.0 - acc[:, None]) * bg_rgb.astype(rgb_map.dtype)
    return rgb_map, depth, acc, {"wmax": wmax, "went": went}


def composite(
    weights: Array,  # (N, S)
    rgbs: Array,  # (N, S, 3)
    t_mids: Array,  # (N, S)
    bg_rgb: Optional[Array] = None,  # (N, 3)
) -> Tuple[Array, Array, Array]:
    """Accumulate color / depth / opacity along rays (the fixed-layout
    equivalent of nerfacc ``accumulate_along_rays``)."""
    rgb_map = jnp.sum(weights[..., None] * rgbs, axis=1)
    depth = jnp.sum(weights * t_mids, axis=1)
    acc = jnp.sum(weights, axis=1)
    if bg_rgb is not None:
        rgb_map = rgb_map + (1.0 - acc[..., None]) * bg_rgb.astype(rgb_map.dtype)
    return rgb_map, depth, acc


# ============================ stratified sampling ============================


def stratified_t_vals(
    key: Optional[jax.Array],
    near: Array,  # (N,)
    far: Array,  # (N,)
    ray_samples: int,
    randomized: bool = True,
) -> Array:
    """S uniform depths per ray in [near, far] with optional stratified jitter
    (reference ray_rendering.py:262-287). Returns (N, S)."""
    t_lin = jnp.linspace(0.0, 1.0, ray_samples)[None, :]
    t_vals = near[:, None] * (1.0 - t_lin) + far[:, None] * t_lin
    if randomized:
        if key is None:
            raise ValueError("randomized stratified sampling needs a PRNG key")
        mids = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
        low = jnp.concatenate([t_vals[:, :1], mids], axis=1)
        high = jnp.concatenate([mids, t_vals[:, -1:]], axis=1)
        u = jax.random.uniform(key, t_vals.shape, dtype=t_vals.dtype)
        t_vals = low + (high - low) * u
    return t_vals


def render_rays_stratified(
    model_fn: Callable[[Array], Array],  # (M, 6) [xyz, dir] → (M, 4) [rgb, σ]
    rays: Array,  # (N, 8)
    ray_samples: int,
    *,
    key: Optional[jax.Array] = None,
    randomized: bool = False,
    bg_rgb: Optional[Array] = None,  # (N, 3)
    sigma_scale: float = 1.0,
) -> Tuple[Array, Array, Array, Array]:
    """Stratified renderer (reference ray_rendering.py:290-345), functional:
    the caller supplies a point-query fn (single expert, or the routed
    container closure) and the background color.

    Returns (rgb_map, depth_map, weights, acc_map).
    """
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]

    t_vals = stratified_t_vals(key, near, far, ray_samples, randomized=randomized)
    pts = o[:, None, :] + d[:, None, :] * t_vals[..., None]  # (N, S, 3)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    xd = jnp.concatenate([pts, dirs], axis=-1).reshape(-1, 6)  # (N·S, 6)

    rgb_sigma = model_fn(xd).reshape(pts.shape[0], pts.shape[1], 4)

    return volume_render(
        rgb_sigma,
        t_vals,
        bg_rgb=bg_rgb,
        raw_rgb=False,
        raw_sigma=False,
        sigma_scale=sigma_scale,
    )
