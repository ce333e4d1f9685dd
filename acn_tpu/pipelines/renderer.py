"""High-level rendering API: full-frame and ray-batch rendering of the
routed container, stratified or occupancy-guided.

Counterpart of the reference's ``render_rays`` dispatcher + ``render_image``
(nerfs/ray_rendering.py:564-627). Chunking happens at the host level over a
*fixed* chunk size (the last chunk is padded), so exactly one jitted program
serves any image size — the reference re-chunks inside a Python loop per call
(ray_rendering.py:324-326).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.nerfs import rays as raylib
from acn_tpu.nerfs.render import bg_default_color, render_rays_stratified
from acn_tpu.nerfs.render_occ import (
    render_expert_occ,
    render_rays_occ,
    render_rays_occ_budget,
)
from acn_tpu.occupancy.grid import OccConfig


class Renderer:
    """Stateless-per-call renderer over (variables, occ_states)."""

    def __init__(
        self,
        cfg: ContainerConfig,
        P,
        occ_cfg: Optional[OccConfig] = None,
        chunk_rays: Optional[int] = None,
    ):
        self.cfg = cfg
        self.P = P
        self.occ_cfg = occ_cfg
        self._chunk_override = None if chunk_rays is None else int(chunk_rays)
        self.chunk_rays = self._chunk_size(occ_cfg is not None)
        self._jitted = {}

    def _chunk_size(self, use_occ: bool) -> int:
        """Rays per jitted chunk, budgeting point-expert evals from
        P.chunk_points. The dense routed eval touches all K experts per
        sample; the corner hash layout additionally builds 8-corner
        temporaries; the occ paths evaluate only s_kept (or the packed
        budget) points per ray — far fewer than ray_samples, so their
        chunks carry proportionally more rays (fewer dispatches/frame)."""
        if self._chunk_override is not None:
            return self._chunk_override
        P, cfg = self.P, self.cfg
        k = max(cfg.num_submodules, 1)
        if use_occ:
            budget = int(getattr(P, "occ_budget_per_ray", 0) or 0)
            s = budget if budget > 0 else min(
                max(int(P.ray_samples), 1),
                int(getattr(P, "occ_s_kept", P.ray_samples)),
            )
        else:
            s = max(int(P.ray_samples), 1)
        expert = getattr(cfg, "expert", None)
        corner = getattr(getattr(expert, "hash", None), "layout", "cell") == "corner"
        blow = 8 if corner else 1
        return max(1024, int(P.chunk_points) // (blow * k * max(s, 1)))

    # ---------------- jitted chunk kernels ----------------

    def _chunk_fn(self, use_occ: bool, active_module: Optional[int],
                  randomized: bool, ray_samples: Optional[int] = None):
        ray_samples = int(ray_samples or self.P.ray_samples)
        key_ = (use_occ, active_module, randomized, ray_samples)
        if key_ in self._jitted:
            return self._jitted[key_]

        cfg, P, occ_cfg = self.cfg, self.P, self.occ_cfg
        # occ marching scales its kept-samples budget with the requested
        # sample count (viewer preview = half samples, reference
        # viewer.py:112-113)
        occ_kept = min(int(P.occ_s_kept), max(ray_samples, 8))

        def render_chunk(variables, occ_states, rays, key):
            n = rays.shape[0]
            k_bg, k_render = jax.random.split(key)
            dirs = rays[:, 3:6]
            if cfg.use_bg_nerf:
                bg = cont.background_color(variables, cfg, dirs)
            elif P.bg_color_default == "none":
                bg = None
            else:
                bg = bg_default_color(k_bg, n, P.bg_color_default)

            if not use_occ:
                if active_module is None:
                    model_fn = lambda xd: cont.container_forward(variables, cfg, xd)
                else:
                    model_fn = lambda xd: cont.container_forward(
                        variables, cfg, xd, active_module=active_module
                    )
                rgb, depth, weights, acc = render_rays_stratified(
                    model_fn,
                    rays,
                    ray_samples,
                    key=k_render if randomized else None,
                    randomized=randomized,
                    bg_rgb=bg,
                )
            else:
                common = dict(
                    s_max=int(P.occ_s_max),
                    s_kept=occ_kept,
                    alpha_thre=occ_cfg.alpha_thre,
                    key=k_render if randomized else None,
                    bg_rgb=bg,
                )
                budget = int(getattr(P, "occ_budget_per_ray", 0) or 0)
                if active_module is None and budget > 0:
                    rgb, depth, weights, acc = render_rays_occ_budget(
                        variables, occ_states, cfg, occ_cfg, rays,
                        s_max=int(P.occ_s_max), budget_per_ray=budget,
                        alpha_thre=occ_cfg.alpha_thre,
                        key=k_render if randomized else None, bg_rgb=bg,
                    )
                elif active_module is None:
                    rgb, depth, weights, acc = render_rays_occ(
                        variables, occ_states, cfg, occ_cfg, rays, **common
                    )
                else:
                    occ_k = jax.tree.map(lambda a: a[active_module], occ_states)
                    rgb, depth, weights, acc = render_expert_occ(
                        variables, occ_k, cfg, occ_cfg, rays,
                        active_module=active_module, **common,
                    )
            # per-ray weight-shape stats used by fog suppression
            # (reference video_gen.py:329-363): max weight and entropy of the
            # normalized weight distribution along each ray. The packed
            # budget renderer computes these as segment stats already.
            if isinstance(weights, dict):
                wmax, went = weights["wmax"], weights["went"]
            else:
                wsum = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-12)
                p = weights / wsum
                went = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)), axis=1)
                wmax = jnp.max(weights, axis=1)
            return rgb, depth, acc, wmax, went

        fn = jax.jit(render_chunk)
        self._jitted[key_] = fn
        return fn

    def _frame_chunk_fn(self, use_occ: bool, active_module: Optional[int],
                        W: int, rows: int, ray_samples: Optional[int]):
        """Jitted frame-chunk renderer that GENERATES ITS RAYS ON DEVICE.

        Full-frame rendering through the remote-TPU tunnel was upload-bound:
        shipping packed rays costs 32 B/pixel (~66 MB for one 1080p frame,
        minutes at tunnel bandwidth). Generating pinhole rays from the pose
        inside the jitted chunk uploads 12 floats per frame instead — the
        camera → rays → march → composite pipeline fuses into one XLA
        program (nothing the reference can do: its ray gen is torch on host,
        ray_sampling.py:111-136).
        """
        key_ = ("frame", use_occ, active_module, W, rows,
                int(ray_samples or self.P.ray_samples))
        if key_ in self._jitted:
            return self._jitted[key_]

        base = self._chunk_fn(use_occ, active_module, False, ray_samples)

        def frame_chunk(variables, occ_states, c2w, intr, aabb, nf, row0, key):
            fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
            j = (row0 + jnp.arange(rows, dtype=jnp.float32))[:, None] + 0.5
            i = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
            j = jnp.broadcast_to(j, (rows, W))
            i = jnp.broadcast_to(i, (rows, W))
            dirs = jnp.stack(
                [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
            )
            dirs = dirs / jnp.clip(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
            )
            rays = raylib.get_rays(dirs.reshape(-1, 3), c2w, aabb=aabb)
            near = jnp.maximum(rays[:, 6], nf[0])
            far = jnp.minimum(rays[:, 7], nf[1])
            valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near + 1e-6)
            rays = rays.at[:, 6].set(jnp.where(valid, near, 0.0))
            rays = rays.at[:, 7].set(jnp.where(valid, far, -1.0))  # inert
            rgb, depth, acc, _, _ = base(variables, occ_states, rays, key)
            # compact outputs: download bandwidth is the frame-rate limit on
            # the remote tunnel (6 f32/pixel ≈ 11 MB per 512×384 view) —
            # quantize to u8 rgb + f16 depth/acc (5 B/pixel → 1 MB)
            rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
            return rgb_u8, depth.astype(jnp.float16), acc.astype(jnp.float16)

        fn = jax.jit(frame_chunk)
        self._jitted[key_] = fn
        return fn

    # ---------------- public API ----------------

    def render_rays(
        self,
        variables,
        occ_states,
        rays: np.ndarray,  # (N, 8)
        *,
        key: Optional[jax.Array] = None,
        use_occ: Optional[bool] = None,
        active_module: Optional[int] = None,
        randomized: bool = False,
        with_stats: bool = False,
        ray_samples: Optional[int] = None,
    ):
        """Chunked ray rendering → (rgb (N,3), depth (N,), acc (N,)) numpy,
        plus (wmax (N,), w_entropy (N,)) when ``with_stats``."""
        use_occ = (self.occ_cfg is not None) if use_occ is None else use_occ
        fn = self._chunk_fn(use_occ, active_module, randomized, ray_samples)
        key = key if key is not None else jax.random.PRNGKey(0)

        N = rays.shape[0]
        C = self._chunk_size(use_occ)
        rgb_out = np.zeros((N, 3), np.float32)
        depth_out = np.zeros((N,), np.float32)
        acc_out = np.zeros((N,), np.float32)
        wmax_out = np.zeros((N,), np.float32)
        went_out = np.zeros((N,), np.float32)

        # dispatch ALL chunks first (JAX queues them asynchronously — through
        # the remote-TPU tunnel a per-chunk sync would cost a round trip each,
        # VERDICT round 1 measured minutes per frame), then block once
        pending = []
        for s in range(0, N, C):
            e = min(s + C, N)
            chunk = rays[s:e]
            if e - s < C:  # pad to the fixed chunk shape
                pad = np.zeros((C - (e - s), 8), np.float32)
                pad[:, 7] = -1.0  # far < near ⇒ inert rays
                chunk = np.concatenate([np.asarray(chunk), pad])
            key, k = jax.random.split(key)
            pending.append((s, e, fn(variables, occ_states, jnp.asarray(chunk), k)))
        for s, e, (rgb, depth, acc, wmax, went) in pending:
            rgb_out[s:e] = np.asarray(rgb)[: e - s]
            depth_out[s:e] = np.asarray(depth)[: e - s]
            acc_out[s:e] = np.asarray(acc)[: e - s]
            wmax_out[s:e] = np.asarray(wmax)[: e - s]
            went_out[s:e] = np.asarray(went)[: e - s]
        if with_stats:
            return rgb_out, depth_out, acc_out, wmax_out, went_out
        return rgb_out, depth_out, acc_out

    def render_image(
        self,
        variables,
        occ_states,
        *,
        H: int,
        W: int,
        intrinsics,  # (4,) [fx, fy, cx, cy]
        c2w,  # (3, 4)
        aabb,  # (2, 3) scene box for per-ray near/far
        key: Optional[jax.Array] = None,
        active_module: Optional[int] = None,
        use_occ: Optional[bool] = None,
        near_far_override=None,
        ray_samples: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full-frame render (reference render_image, ray_rendering.py:577-627),
        generating rays ON DEVICE (12-float pose upload per frame — see
        _frame_chunk_fn). Returns (rgb (H,W,3) linear [0,1], depth (H·W,),
        acc (H·W,))."""
        use_occ = (self.occ_cfg is not None) if use_occ is None else use_occ
        rows = max(self._chunk_size(use_occ) // W, 1)
        fn = self._frame_chunk_fn(use_occ, active_module, W, rows, ray_samples)

        c2w_j = jnp.asarray(np.asarray(c2w, np.float32))
        intr_j = jnp.asarray(np.asarray(intrinsics[:4], np.float32))
        aabb_j = jnp.asarray(np.asarray(aabb, np.float32))
        n_o, f_o = (near_far_override or (None, None))
        nf_j = jnp.asarray(
            [n_o if n_o is not None else -np.inf,
             f_o if f_o is not None else np.inf], jnp.float32
        )
        key = key if key is not None else jax.random.PRNGKey(0)

        rgb_out = np.zeros((H * W, 3), np.float32)
        depth_out = np.zeros((H * W,), np.float32)
        acc_out = np.zeros((H * W,), np.float32)
        pending = []
        for r0 in range(0, H, rows):  # dispatch all chunks, sync once
            key, k = jax.random.split(key)
            pending.append(
                (r0, fn(variables, occ_states, c2w_j, intr_j, aabb_j, nf_j,
                        jnp.float32(r0), k))
            )
        for r0, (rgb_u8, depth, acc) in pending:
            s, e = r0 * W, min((r0 + rows) * W, H * W)
            rgb_out[s:e] = np.asarray(rgb_u8)[: e - s].astype(np.float32) / 255.0
            depth_out[s:e] = np.asarray(depth)[: e - s].astype(np.float32)
            acc_out[s:e] = np.asarray(acc)[: e - s].astype(np.float32)
        rgb = np.clip(rgb_out, 0.0, 1.0).reshape(H, W, 3)
        return rgb, depth_out, acc_out
