"""Axis-aligned scene boxes as pure functions over ``(2, 3)`` arrays.

TPU-native counterpart of the reference's ``nerfs/scene_box.py`` (SceneBox
dataclass, reference scene_box.py:10-217). Instead of a torch dataclass with
methods, the AABB is a plain ``(2, 3)`` array ``[min, max]`` (world DRB
convention) and every operation is a jit-compatible function, so boxes can be
stacked ``(K, 2, 3)`` and vmapped across experts.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Default slab-test tags (match reference get_rays defaults,
# reference ray_sampling.py:57-58).
AABB_MAX_BOUND = 1e10
AABB_INVALID_VALUE = 1e10


def make_aabb(mins, maxs) -> Array:
    """Build a (2, 3) AABB from min / max corners."""
    return jnp.stack([jnp.asarray(mins, jnp.float32), jnp.asarray(maxs, jnp.float32)])


def center(aabb: Array) -> Array:
    return 0.5 * (aabb[..., 0, :] + aabb[..., 1, :])


def extent(aabb: Array) -> Array:
    return aabb[..., 1, :] - aabb[..., 0, :]


def diagonal_length(aabb: Array) -> Array:
    return jnp.linalg.norm(extent(aabb), axis=-1)


def ray_aabb_intersect(
    aabb: Array,  # (2, 3)
    origins: Array,  # (N, 3)
    directions: Array,  # (N, 3)
    eps: float = 1e-8,
    max_bound: float = AABB_MAX_BOUND,
    invalid_value: float = AABB_INVALID_VALUE,
) -> Tuple[Array, Array]:
    """Vectorized slab test with clamping and invalid tagging.

    Semantics match reference scene_box.py:45-107:
      * near-zero direction components are replaced with ±eps,
      * t is clamped to [0, max_bound],
      * rays with no forward hit get (invalid_value, invalid_value).

    Returns (t_min, t_max), each (N,).
    """
    d_safe = jnp.where(
        jnp.abs(directions) < eps,
        jnp.where(directions >= 0, eps, -eps),
        directions,
    )
    inv = 1.0 / d_safe

    t0 = (aabb[0][None, :] - origins) * inv  # (N, 3)
    t1 = (aabb[1][None, :] - origins) * inv

    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)

    t_min = jnp.clip(t_min, 0.0, max_bound)
    t_max = jnp.clip(t_max, 0.0, max_bound)

    invalid = t_max <= t_min
    t_min = jnp.where(invalid, invalid_value, t_min)
    t_max = jnp.where(invalid, invalid_value, t_max)
    return t_min, t_max


def intersects_segment(
    aabb: Array,  # (2, 3)
    rays: Array,  # (N, 8) packed [o, d, near, far]
    eps: float = 1e-9,
) -> Array:
    """Boolean prefilter: does ray ∩ AABB ∩ [near, far] have positive length?

    Mirrors the per-expert prefilter ``_intersect_rays_aabb``
    (reference ray_rendering.py:171-193).
    """
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    inv = jnp.where(jnp.abs(d) > eps, 1.0 / d, 1.0 / eps)
    t0 = (aabb[0][None, :] - o) * inv
    t1 = (aabb[1][None, :] - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(tmin, near)
    t_exit = jnp.minimum(tmax, far)
    return t_exit > t_enter


def within(aabb: Array, pts: Array, inclusive: bool = False) -> Array:
    """Membership test (reference scene_box.py:110-113)."""
    if inclusive:
        return jnp.all(pts >= aabb[0], axis=-1) & jnp.all(pts <= aabb[1], axis=-1)
    return jnp.all(pts > aabb[0], axis=-1) & jnp.all(pts < aabb[1], axis=-1)


def normalized_positions(pts: Array, aabb: Array) -> Array:
    """World → [0, 1]^3 against an AABB (reference scene_box.py:129-134)."""
    return (pts - aabb[0]) / (aabb[1] - aabb[0])


def expand(aabb: Array, pad: Union[float, Sequence[float], Array]) -> Array:
    """Pad the box: scalar, (3,) symmetric, or (2, 3) asymmetric
    (reference scene_box.py:162-205). Host-side helper (numpy-friendly)."""
    pad_t = np.asarray(pad, dtype=np.float32)
    if pad_t.ndim == 0:
        pad_min = pad_max = np.broadcast_to(pad_t, (3,))
    elif pad_t.shape in ((3,), (1, 3)):
        p = pad_t.reshape(-1, 3)[-1]
        pad_min = pad_max = p
    elif pad_t.shape == (2, 3):
        pad_min, pad_max = pad_t[0], pad_t[1]
    else:
        raise ValueError(f"pad must be scalar, (3,), (1,3) or (2,3); got {pad_t.shape}")
    mn = np.asarray(aabb)[0] - pad_min
    mx = np.asarray(aabb)[1] + pad_max
    if not np.all(mn < mx):
        raise ValueError(f"expand produced invalid AABB: min {mn} not < max {mx}")
    return jnp.stack([jnp.asarray(mn), jnp.asarray(mx)])


def union(a: Array, b: Array) -> Array:
    mn = jnp.minimum(a[0], b[0])
    mx = jnp.maximum(a[1], b[1])
    return jnp.stack([mn, mx])


def reduce_union(aabbs: Array) -> Array:
    """(K, 2, 3) → (2, 3) union."""
    mn = jnp.min(aabbs[:, 0, :], axis=0)
    mx = jnp.max(aabbs[:, 1, :], axis=0)
    return jnp.stack([mn, mx])


def from_camera_poses(poses: Array, scale_factor: float = 1.0) -> Array:
    """AABB of camera centers (reference scene_box.py:137-146)."""
    xyzs = poses[..., :3, -1]
    mn = jnp.min(xyzs, axis=-2)
    mx = jnp.max(xyzs, axis=-2)
    return jnp.stack([mn, mx]) * scale_factor


# ============================ oriented boxes ============================
#
# Functional port of the reference's OrientedBox (scene_box.py:220-264),
# used by the viewer for crop widgets. An OBB is the tuple (R (3,3), T (3,),
# S (3,)) — rotation, center, full sizes.


def obb_from_params(pos, rpy, scale) -> tuple:
    """Build (R, T, S) from position / roll-pitch-yaw (radians) / scale
    (reference OrientedBox.from_params, scene_box.py:244-254)."""
    r, p, y = [jnp.asarray(v, jnp.float32) for v in rpy]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    Rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    R = Rz @ Ry @ Rx
    return R, jnp.asarray(pos, jnp.float32), jnp.asarray(scale, jnp.float32)


def obb_within(obb: tuple, pts: Array) -> Array:
    """Boolean mask of points inside the OBB (reference
    OrientedBox.within, scene_box.py:229-242)."""
    R, T, S = obb
    local = (pts - T[None, :]) @ R  # worldR^T x = x @ R
    half = S / 2.0
    return jnp.all((local > -half[None, :]) & (local < half[None, :]), axis=-1)


def obb_to_aabb(obb: tuple) -> Array:
    """Tight world-aligned AABB of the OBB (reference
    OrientedBox.to_aabb, scene_box.py:256-264)."""
    R, T, S = obb
    ext = jnp.abs(R) @ (S / 2.0)
    return jnp.stack([T - ext, T + ext])
