"""Ray construction and packing.

TPU-native counterpart of the reference's ``nerfs/ray_sampling.py``.
Conventions (critical, see reference ray_sampling.py:111-136 and
scripts/prepare_dataset.py:26-100):

* cameras are **RUB** (x right, y up, z back; -z is the viewing direction),
* world frame is **DRB** (x down, y right, z back of the reference ENU→DRB
  mapping) — poses are c2w ``(3, 4)`` with rotation RUB→DRB and DRB
  translation normalized by origin / pose_scale_factor,
* packed rays are ``(..., 8)`` = ``[ox oy oz dx dy dz near far]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from acn_tpu.nerfs import scene_box as sbox

Array = jnp.ndarray


def rays_cam_to_world(dirs_cam: Array, c2w: Array) -> Tuple[Array, Array]:
    """Camera-frame directions → world origins & directions
    (reference ray_sampling.py:10-24)."""
    shape = dirs_cam.shape
    flat = dirs_cam.reshape(-1, 3)
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    dirs_w = flat @ R.T
    org_w = jnp.broadcast_to(t, dirs_w.shape)
    return org_w.reshape(shape), dirs_w.reshape(shape)


def pack_rays(rays_o: Array, rays_d: Array, near: Array, far: Array) -> Array:
    """Pack [o, d, near, far] into the last dimension (→ (..., 8))."""
    return jnp.concatenate([rays_o, rays_d, near, far], axis=-1)


def unpack_rays(rays: Array) -> Tuple[Array, Array, Array, Array]:
    """(..., 8) → (origins, dirs, near, far) flat (N, ·) tensors."""
    assert rays.shape[-1] == 8, "packed rays must be (..., 8)"
    flat = rays.reshape(-1, 8)
    return flat[:, :3], flat[:, 3:6], flat[:, 6:7], flat[:, 7:8]


def get_ray_directions(
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    center_pixels: bool = True,
) -> Array:
    """Unit camera-frame directions (H, W, 3) for a pinhole RUB camera.

    Matches reference ray_sampling.py:111-136: x = (i - cx)/fx,
    y = -(j - cy)/fy, z = -1, then normalized.
    """
    j = jnp.arange(H, dtype=jnp.float32)[:, None]
    i = jnp.arange(W, dtype=jnp.float32)[None, :]
    if center_pixels:
        i = i + 0.5
        j = j + 0.5
    i = jnp.broadcast_to(i, (H, W))
    j = jnp.broadcast_to(j, (H, W))
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)],
        axis=-1,
    )
    norm = jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    return dirs / norm


def get_rays(
    directions: Array,  # (H, W, 3) or (N, 3)
    c2w: Array,  # (3, 4) or (4, 4)
    aabb: Optional[Array] = None,  # (2, 3) scene box
    near: Optional[float] = None,
    far: Optional[float] = None,
    *,
    aabb_max_bound: float = sbox.AABB_MAX_BOUND,
    aabb_invalid_value: float = sbox.AABB_INVALID_VALUE,
) -> Array:
    """Build packed rays (reference ray_sampling.py:50-108).

    Per-ray near/far come from the scene-box slab test when ``aabb`` is given,
    otherwise from the ``near`` / ``far`` constants.
    """
    if directions.ndim == 2 and directions.shape[-1] == 3:
        flat_input = True
        H = W = None
    elif directions.ndim == 3 and directions.shape[-1] == 3:
        flat_input = False
        H, W, _ = directions.shape
    else:
        raise ValueError(
            f"directions must be (H, W, 3) or (N, 3), got {directions.shape}"
        )

    rays_o, rays_d = rays_cam_to_world(directions, c2w)
    o_flat = rays_o.reshape(-1, 3)
    d_flat = rays_d.reshape(-1, 3)

    if aabb is not None:
        tmin, tmax = sbox.ray_aabb_intersect(
            aabb,
            o_flat,
            d_flat,
            eps=1e-8,
            max_bound=aabb_max_bound,
            invalid_value=aabb_invalid_value,
        )
        near_vals = tmin[:, None]
        far_vals = tmax[:, None]
    else:
        if near is None or far is None:
            raise ValueError("Provide near/far when aabb is None")
        N = o_flat.shape[0]
        near_vals = jnp.full((N, 1), float(near), dtype=o_flat.dtype)
        far_vals = jnp.full((N, 1), float(far), dtype=o_flat.dtype)

    if flat_input:
        return jnp.concatenate([o_flat, d_flat, near_vals, far_vals], axis=-1)
    return pack_rays(
        rays_o, rays_d, near_vals.reshape(H, W, 1), far_vals.reshape(H, W, 1)
    )


def clamp_rays_near_far(
    rays: Array,  # (N, 8)
    near_far_override: Optional[Tuple[Optional[float], Optional[float]]],
    *,
    eps: float = 1e-6,
    invalid_value: float = jnp.inf,
) -> Tuple[Array, Array]:
    """Clamp near/far with optional overrides; tag invalid rays
    (reference ray_sampling.py:139-176). Returns (rays, valid_mask)."""
    near = rays[:, 6]
    far = rays[:, 7]
    if near_far_override is None:
        valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near + eps)
        return rays, valid

    n_override, f_override = near_far_override
    if n_override is not None:
        near = jnp.maximum(near, jnp.float32(n_override))
    if f_override is not None:
        far = jnp.minimum(far, jnp.float32(f_override))

    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near + eps)
    near = jnp.where(valid, near, invalid_value)
    far = jnp.where(valid, far, invalid_value)
    rays = rays.at[:, 6].set(near).at[:, 7].set(far)
    return rays, valid
