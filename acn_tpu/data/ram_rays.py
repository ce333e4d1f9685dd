"""Eager in-RAM ray store.

Counterpart of the reference's ``data/ram_rays_dataset.py`` RamRaysDataset:
for every image, build all pixel rays against the (expert or global) scene
box, apply the cluster mask and Mega-NeRF validation balancing, clamp
near/far, and keep flat numpy arrays ``rays (N, 8)``, ``rgbs (N, 3)`` float32
and ``img_indices (N,)`` int32. Per-image work fans out over a process pool
exactly like the reference (ram_rays_dataset.py:170-191).
"""

from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from acn_tpu.data.image_metadata import ImageMetadata
from acn_tpu.data.ray_prep import (
    clamp_rays_near_far_np,
    get_ray_directions_np,
    get_rays_np,
)


def apply_meganerf_val_balancing(
    keep_mask: np.ndarray, H: int, W: int, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Mega-NeRF val balancing (reference ram_rays_dataset.py:237-258):
    discard the right image half, and re-add the same number of previously
    unmasked *left*-half pixels so the kept count is preserved."""
    rng = rng or np.random.default_rng(0)
    keep_mask = keep_mask.reshape(H, W).copy()
    left = keep_mask[:, : W // 2]
    right = keep_mask[:, W // 2 :]
    discard_pos = int(right.sum())
    if discard_pos > 0:
        candidates = np.arange(H * W).reshape(H, W)[:, : W // 2]
        not_kept_left = candidates[~left]
        if not_kept_left.size > 0:
            to_add = rng.permutation(not_kept_left)[:discard_pos]
            flat = keep_mask.reshape(-1)
            flat[to_add] = True
            keep_mask = flat.reshape(H, W)
    keep_mask[:, W // 2 :] = False
    return keep_mask.reshape(-1)


def process_single_image(
    md: Optional[ImageMetadata],
    center_pixels: bool,
    val_balancing: bool,
    aabb: Optional[np.ndarray],
    near_far_override,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """One image → (rgbs (M,3) f32 in [0,1], rays (M,8), indices (M,) i32)
    (reference ram_rays_dataset.py:46-121)."""
    if md is None:
        return None
    img = md.load_image()
    if img is None:
        return None

    keep_mask = md.load_mask()
    if md.is_val and val_balancing:
        if keep_mask is None:
            keep_mask = np.ones((md.H, md.W), bool)
        keep_mask = apply_meganerf_val_balancing(
            keep_mask, md.H, md.W, np.random.default_rng(md.image_index)
        ).reshape(md.H, md.W)

    if keep_mask is not None and keep_mask.sum() == 0:
        return None

    fx, fy, cx, cy = [float(v) for v in md.intrinsics[:4]]
    dirs = get_ray_directions_np(md.H, md.W, fx, fy, cx, cy, center_pixels)
    rays = get_rays_np(dirs, md.c2w, aabb=aabb).reshape(-1, 8)
    img = img.reshape(-1, 3)

    if keep_mask is not None:
        flat_mask = keep_mask.reshape(-1)
        rays = rays[flat_mask]
        img = img[flat_mask]

    rays, valid = clamp_rays_near_far_np(rays, near_far_override)
    if not valid.any():
        return None
    rays = rays[valid]
    rgbs = img[valid].astype(np.float32) / 255.0
    indices = np.full((len(rgbs),), md.image_index, np.int32)
    return rgbs, rays, indices


class RamRaysDataset:
    """Flat ray store; indexable and samplable.

    Unlike the reference's torch ``Dataset`` feeding a multi-worker
    ``DataLoader``, downstream consumers here are array-sampling functions
    (episodic task sampler / TTO batcher) that slice these arrays directly
    and feed the device — no per-ray Python ``__getitem__`` hot path.
    """

    def __init__(
        self,
        metadata_items: List[ImageMetadata],
        center_pixels: bool = True,
        val_balancing: bool = False,
        aabb: Optional[np.ndarray] = None,
        near_far_override=None,
        num_workers: Optional[int] = None,
    ):
        cpu_count = os.cpu_count() or 1
        if num_workers is None:
            num_workers = min(8, max(1, cpu_count // 2))

        rgbs, rays, indices = [], [], []
        args = (center_pixels, val_balancing, aabb, near_far_override)

        if len(metadata_items) > 8 and num_workers > 1:
            # spawn, not fork: the parent holds live JAX/TPU-client threads by
            # the time datasets are built, and forking them deadlocks
            # (the reference also spawns, ram_rays_dataset.py:175)
            ctx = multiprocessing.get_context("spawn")
            with ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx) as ex:
                results = ex.map(
                    process_single_image,
                    metadata_items,
                    *[[a] * len(metadata_items) for a in args],
                    chunksize=8,
                )
                for res in results:
                    if res is None:
                        continue
                    rgbs.append(res[0])
                    rays.append(res[1])
                    indices.append(res[2])
        else:
            for md in metadata_items:
                res = process_single_image(md, *args)
                if res is None:
                    continue
                rgbs.append(res[0])
                rays.append(res[1])
                indices.append(res[2])

        if not rgbs:
            self.rgbs = np.zeros((0, 3), np.float32)
            self.rays = np.zeros((0, 8), np.float32)
            self.img_indices = np.zeros((0,), np.int32)
            self.num_images = 0
        else:
            self.rgbs = np.concatenate(rgbs)
            self.rays = np.concatenate(rays)
            self.img_indices = np.concatenate(indices)
            self.num_images = len(rgbs)

    def __len__(self) -> int:
        return len(self.rgbs)

    def sample(self, rng: np.random.Generator, n: int):
        """Uniform ray batch with replacement-free sampling when possible."""
        if len(self) == 0:
            raise ValueError("empty RamRaysDataset")
        replace = n > len(self)
        idx = rng.choice(len(self), size=n, replace=replace)
        return self.rays[idx], self.rgbs[idx], self.img_indices[idx]
