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
    render_expert_occ_budget,
    render_rays_occ,
    render_rays_occ_budget,
)
from acn_tpu.occupancy.grid import OccConfig


def _pinhole_block_rays(rows: int, W: int, c2w, intr, aabb, nf, row0, col0):
    """Generate the (rows × W) pixel block's rays ON DEVICE from the pose:
    12 floats of upload per frame instead of 32 B/pixel of packed rays (the
    remote-tunnel lesson; the reference's ray gen is torch on host,
    ray_sampling.py:111-136). Rays outside [near, far] validity are made
    inert (far < near)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    j = (row0 + jnp.arange(rows, dtype=jnp.float32))[:, None] + 0.5
    i = (col0 + jnp.arange(W, dtype=jnp.float32))[None, :] + 0.5
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
    return rays


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
        # render-time bin resolution: the march touches N·s_max bins per
        # chunk, which dominates frame cost at tight budgets — serving paths
        # may march coarser bins than the eval-parity instrument
        s_max_r = int(getattr(P, "occ_render_s_max", 0) or 0) or int(P.occ_s_max)
        # range-finding pre-pass for the single-expert (routed-rect) serving
        # path: spend s_coarse cheap bin tests to concentrate s_max_r fine
        # bins on the expert's occupied span (occ_grid.coarse_ray_range)
        s_coarse_r = int(getattr(P, "occ_render_s_coarse", 0) or 0)

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
                    s_max=s_max_r,
                    s_kept=occ_kept,
                    alpha_thre=occ_cfg.alpha_thre,
                    key=k_render if randomized else None,
                    bg_rgb=bg,
                )
                budget = int(getattr(P, "occ_budget_per_ray", 0) or 0)
                if active_module is None and budget > 0:
                    rgb, depth, weights, acc = render_rays_occ_budget(
                        variables, occ_states, cfg, occ_cfg, rays,
                        s_max=s_max_r, budget_per_ray=budget,
                        alpha_thre=occ_cfg.alpha_thre,
                        key=k_render if randomized else None, bg_rgb=bg,
                    )
                elif active_module is None:
                    rgb, depth, weights, acc = render_rays_occ(
                        variables, occ_states, cfg, occ_cfg, rays, **common
                    )
                elif budget > 0:
                    occ_k = jax.tree.map(lambda a: a[active_module], occ_states)
                    rgb, depth, weights, acc = render_expert_occ_budget(
                        variables, occ_k, cfg, occ_cfg, rays,
                        active_module=active_module, s_max=s_max_r,
                        budget_per_ray=budget, alpha_thre=occ_cfg.alpha_thre,
                        key=k_render if randomized else None, bg_rgb=bg,
                        s_coarse=s_coarse_r,
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

        ``W`` here is the *crop* width: the chunk covers a (rows × W) pixel
        block anchored at runtime offsets (row0, col0) — full frames use
        col0=0 / W = image width; the routed per-expert path renders each
        expert's image-space rectangle only.
        """
        key_ = ("frame", use_occ, active_module, W, rows,
                int(ray_samples or self.P.ray_samples))
        if key_ in self._jitted:
            return self._jitted[key_]

        base = self._chunk_fn(use_occ, active_module, False, ray_samples)

        def frame_chunk(variables, occ_states, c2w, intr, aabb, nf, row0,
                        col0, key):
            rays = _pinhole_block_rays(rows, W, c2w, intr, aabb, nf, row0,
                                       col0)
            rgb, depth, acc, _, _ = base(variables, occ_states, rays, key)
            # compact outputs: download bandwidth is the frame-rate limit on
            # the remote tunnel (6 f32/pixel ≈ 11 MB per 512×384 view) —
            # quantize to u8 rgb + f16 depth/acc (5 B/pixel → 1 MB)
            rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
            return rgb_u8, depth.astype(jnp.float16), acc.astype(jnp.float16)

        fn = jax.jit(frame_chunk)
        self._jitted[key_] = fn
        return fn

    def _frame_chunk_mesh_fn(self, use_occ: bool, active_module: Optional[int],
                             W: int, rows: int, ray_samples: Optional[int],
                             mesh):
        """SPMD super-chunk renderer over a device mesh (SURVEY §5 / the
        v5e-8 serving path): ONE jitted ``shard_map`` program in which every
        mesh slot renders its own ``rows``-row block of the frame — slot i
        derives its row offset from ``lax.axis_index``, generates its rays
        on device, and renders independently. Parameters are replicated;
        row blocks are disjoint, so the program contains ZERO collectives —
        frame latency divides by the mesh size, and each slot runs exactly
        the single-device program (pixel-identical output,
        tests/test_renderer_mesh.py). The reference has no frame-parallel
        path at all (single-GPU render_image, ray_rendering.py:577-627)."""
        n_dev = mesh.devices.size
        key_ = ("mesh_frame", use_occ, active_module, W, rows,
                int(ray_samples or self.P.ray_samples),
                tuple(d.id for d in mesh.devices.flat))
        if key_ in self._jitted:
            return self._jitted[key_]

        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        base = self._chunk_fn(use_occ, active_module, False, ray_samples)
        axis = mesh.axis_names[0]

        def frame_block(variables, occ_states, c2w, intr, aabb, nf, row0,
                        col0, keys):
            slot = jax.lax.axis_index(axis).astype(jnp.float32)
            rays = _pinhole_block_rays(rows, W, c2w, intr, aabb, nf,
                                       row0 + slot * rows, col0)
            rgb, depth, acc, _, _ = base(variables, occ_states, rays,
                                         keys[0])
            rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
            return rgb_u8, depth.astype(jnp.float16), acc.astype(jnp.float16)

        # pallas_call (the opt-in segscan kernel in composite_packed)
        # produces outputs without vma metadata, which the strict shard_map
        # default rejects at trace time — drop the check only when that
        # backend is active; the default XLA path keeps it
        from acn_tpu.ops.segscan import resolve_backend

        fn = jax.jit(shard_map(
            frame_block, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS(), PS(), PS(), PS(), PS(),
                      PS(axis)),
            out_specs=(PS(axis), PS(axis), PS(axis)),
            check_vma=resolve_backend() == "xla",
        ))
        self._jitted[key_] = (fn, n_dev)
        return fn, n_dev

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
        download: bool = True,
        mesh=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full-frame render (reference render_image, ray_rendering.py:577-627),
        generating rays ON DEVICE (12-float pose upload per frame — see
        _frame_chunk_fn). Returns (rgb (H,W,3) linear [0,1], depth (H·W,),
        acc (H·W,)); with ``download=False`` the frame stays on device
        (blocks until computed, returns ``(None, None, None)``) — separates
        render compute from host-transfer bandwidth, which on the remote
        tunnel is an environment artifact rather than a serving cost.

        ``mesh``: a 1D jax.sharding.Mesh — row blocks of the frame shard
        across its devices in one SPMD program (see _frame_chunk_mesh_fn);
        output is pixel-identical to the single-device path."""
        use_occ = (self.occ_cfg is not None) if use_occ is None else use_occ
        rows = max(self._chunk_size(use_occ) // W, 1)
        if mesh is not None:
            fn_m, n_dev = self._frame_chunk_mesh_fn(
                use_occ, active_module, W, rows, ray_samples, mesh)
            fn = lambda *a: fn_m(*a[:-1], jax.random.split(a[-1], n_dev))
            rows_disp = rows * n_dev  # rows per dispatch
        else:
            fn = self._frame_chunk_fn(use_occ, active_module, W, rows,
                                      ray_samples)
            rows_disp = rows

        c2w_j = jnp.asarray(np.asarray(c2w, np.float32))
        intr_j = jnp.asarray(np.asarray(intrinsics[:4], np.float32))
        aabb_j = jnp.asarray(np.asarray(aabb, np.float32))
        n_o, f_o = (near_far_override or (None, None))
        nf_j = jnp.asarray(
            [n_o if n_o is not None else -np.inf,
             f_o if f_o is not None else np.inf], jnp.float32
        )
        key = key if key is not None else jax.random.PRNGKey(0)

        pending = []
        for r0 in range(0, H, rows_disp):  # dispatch all chunks, sync once
            key, k = jax.random.split(key)
            pending.append(
                (r0, fn(variables, occ_states, c2w_j, intr_j, aabb_j, nf_j,
                        jnp.float32(r0), jnp.float32(0.0), k))
            )
        if not download:
            for _, outs in pending:
                for o in outs:
                    o.block_until_ready()
            return None, None, None
        rgb_out = np.zeros((H * W, 3), np.float32)
        depth_out = np.zeros((H * W,), np.float32)
        acc_out = np.zeros((H * W,), np.float32)
        for r0, (rgb_u8, depth, acc) in pending:
            s, e = r0 * W, min((r0 + rows_disp) * W, H * W)
            rgb_out[s:e] = np.asarray(rgb_u8)[: e - s].astype(np.float32) / 255.0
            depth_out[s:e] = np.asarray(depth)[: e - s].astype(np.float32)
            acc_out[s:e] = np.asarray(acc)[: e - s].astype(np.float32)
        rgb = np.clip(rgb_out, 0.0, 1.0).reshape(H, W, 3)
        return rgb, depth_out, acc_out

    # ---------------- routed (per-expert rect) frame rendering ----------------

    @staticmethod
    def _expert_rects(expert_aabbs: np.ndarray, c2w, intrinsics, H: int,
                      W: int, pad_px: int) -> np.ndarray:
        """Project each expert's AABB into the image → conservative pixel
        rects (K, 4) [r0, r1, c0, c1) (half-open), padded by ``pad_px`` and
        clipped. An AABB with corners behind (or straddling) the camera
        plane projects to the full frame."""
        c2w = np.asarray(c2w, np.float32)
        R, t = c2w[:3, :3], c2w[:3, 3]
        fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics[:4])]
        rects = np.zeros((expert_aabbs.shape[0], 4), np.int64)
        for k, ab in enumerate(np.asarray(expert_aabbs, np.float32)):
            lo, hi = ab[0], ab[1]
            corners = np.array(
                [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                 for z in (lo[2], hi[2])], np.float32
            )
            cam = (corners - t) @ R  # R^T (X - t), row-vector form
            zneg = -cam[:, 2]
            inside = np.all(corners.min(0) <= t) and np.all(t <= corners.max(0))
            if inside or np.any(zneg <= 1e-6):
                rects[k] = (0, H, 0, W)  # conservative: full frame
                continue
            i = cx + fx * cam[:, 0] / zneg
            j = cy - fy * cam[:, 1] / zneg
            rects[k] = (
                max(int(np.floor(j.min())) - pad_px, 0),
                min(int(np.ceil(j.max())) + 1 + pad_px, H),
                max(int(np.floor(i.min())) - pad_px, 0),
                min(int(np.ceil(i.max())) + 1 + pad_px, W),
            )
        return rects

    @staticmethod
    def _feather_weights(rect, H, W, blend_px: int) -> np.ndarray:
        """(rows, cols) stitching weights for one rect: 1 in the interior,
        linear ramp to 0 over ``blend_px`` at rect edges that are not image
        borders."""
        r0, r1, c0, c1 = [int(v) for v in rect]
        rr = np.arange(r0, r1, dtype=np.float32)
        cc = np.arange(c0, c1, dtype=np.float32)
        one_r = np.ones_like(rr)
        one_c = np.ones_like(cc)
        b = max(float(blend_px), 1.0)
        wr_lo = one_r if r0 <= 0 else np.clip((rr - r0 + 1.0) / b, 0.0, 1.0)
        wr_hi = one_r if r1 >= H else np.clip((r1 - rr) / b, 0.0, 1.0)
        wc_lo = one_c if c0 <= 0 else np.clip((cc - c0 + 1.0) / b, 0.0, 1.0)
        wc_hi = one_c if c1 >= W else np.clip((c1 - cc) / b, 0.0, 1.0)
        return np.minimum(wr_lo, wr_hi)[:, None] * np.minimum(wc_lo, wc_hi)[None, :]

    def render_image_routed(
        self,
        variables,
        occ_states,
        *,
        H: int,
        W: int,
        intrinsics,
        c2w,
        aabb,
        key: Optional[jax.Array] = None,
        use_occ: Optional[bool] = None,
        near_far_override=None,
        ray_samples: Optional[int] = None,
        download: bool = True,
        blend_px: int = 32,
        expert_aabbs: Optional[np.ndarray] = None,
        acc_eps: float = 1e-4,
        mesh=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full-frame render via per-expert image-rect dispatch.

        The dense soft-MoE frame path evaluates ALL K experts at every
        sample; with a 2×2 city grid ~4× of that work is off-region. Here
        each expert renders only the image rectangle its (margined) AABB
        projects to — single-expert evaluation, so hash/MLP row traffic per
        pixel drops K× — and overlapping rects are feather-blended on the
        host. This is the TPU-shaped analogue of the reference's per-region
        ray dispatch (masks route rays to their region's expert,
        pipelines/online_stage/runtime_adapt.py + viewer region preview);
        the soft-MoE path (`render_image`) remains the eval-parity
        instrument. With identical expert params the two paths agree to
        float tolerance (tests/test_renderer_routed.py).

        Stitching weights are ``feather × (acc + acc_eps)``, not feather
        alone: rects are conservative (behind-camera AABBs and the
        uncovered-pixel fallback widen to full frame), so an expert often
        renders pixels outside its own region where its occ grid is empty —
        pure background at acc≈0. Opacity-weighting makes such renders
        contribute ~nothing wherever any expert has real content, while
        pixels no expert covers still normalize to the blended background
        (every term is background there)."""
        use_occ = (self.occ_cfg is not None) if use_occ is None else use_occ
        if expert_aabbs is None:
            expert_aabbs = np.asarray(variables["buffers"]["expert_aabbs"])
        K = expert_aabbs.shape[0]
        rects = self._expert_rects(expert_aabbs, c2w, intrinsics, H, W,
                                   pad_px=blend_px)

        # cover pixels no rect claims (rays that miss every region see pure
        # background): widest rect goes full-frame
        ws = np.zeros((H, W), np.float32)
        for k in range(K):
            r0, r1, c0, c1 = rects[k]
            ws[r0:r1, c0:c1] += 1.0
        if (ws <= 0).any():
            areas = (rects[:, 1] - rects[:, 0]) * (rects[:, 3] - rects[:, 2])
            rects[int(np.argmax(areas))] = (0, H, 0, W)

        c2w_j = jnp.asarray(np.asarray(c2w, np.float32))
        intr_j = jnp.asarray(np.asarray(intrinsics[:4], np.float32))
        aabb_j = jnp.asarray(np.asarray(aabb, np.float32))
        n_o, f_o = (near_far_override or (None, None))
        nf_j = jnp.asarray(
            [n_o if n_o is not None else -np.inf,
             f_o if f_o is not None else np.inf], jnp.float32
        )
        key = key if key is not None else jax.random.PRNGKey(0)
        # single-expert chunks carry K× more rays: only one expert evaluates
        chunk = self._chunk_size(use_occ) * max(self.cfg.num_submodules, 1)

        pending = []  # (k, r0, rows_this, c0, W_crop, outs)
        for k in range(K):
            r0k, r1k, c0k, c1k = [int(v) for v in rects[k]]
            if r1k <= r0k or c1k <= c0k:
                continue
            # quantize crop width to bound the number of distinct jitted
            # programs (128-px steps), re-anchoring so the crop stays inside
            W_crop = min(W, int(np.ceil((c1k - c0k) / 128.0)) * 128)
            c0k = max(0, min(c0k, W - W_crop))
            # chunk rows: bounded by the eval budget AND by the rect height
            # (quantized to 64-row steps) — a 290-row rect must not pay for a
            # full 976-row chunk of mostly off-rect rays (measured 3× frame
            # waste at preview res)
            rows = max(chunk // W_crop, 1)
            rows = min(rows, int(np.ceil((r1k - r0k) / 64.0)) * 64)
            if mesh is not None:
                # split this rect's rows over the mesh: each slot takes a
                # 64-row-quantized share, one SPMD dispatch per super-chunk
                n_dev = mesh.devices.size
                rows = min(rows, max(
                    int(np.ceil((r1k - r0k) / n_dev / 64.0)) * 64, 64))
                fn_m, _ = self._frame_chunk_mesh_fn(
                    use_occ, k, W_crop, rows, ray_samples, mesh)
                fn = lambda *a: fn_m(*a[:-1], jax.random.split(a[-1], n_dev))
                rows_disp = rows * n_dev
            else:
                fn = self._frame_chunk_fn(use_occ, k, W_crop, rows,
                                          ray_samples)
                rows_disp = rows
            for r0 in range(r0k, r1k, rows_disp):
                key, kk = jax.random.split(key)
                pending.append(
                    (k, r0, min(rows_disp, r1k - r0), c0k, W_crop,
                     fn(variables, occ_states, c2w_j, intr_j, aabb_j, nf_j,
                        jnp.float32(r0), jnp.float32(c0k), kk))
                )
        if not download:
            for *_, outs in pending:
                for o in outs:
                    o.block_until_ready()
            return None, None, None

        rgb_acc = np.zeros((H, W, 3), np.float32)
        depth_acc = np.zeros((H, W), np.float32)
        acc_acc = np.zeros((H, W), np.float32)
        w_acc = np.zeros((H, W), np.float32)
        feathers = {k: self._feather_weights(rects[k], H, W, blend_px)
                    for k in range(K)}
        for k, r0, rows_this, c0, W_crop, (rgb_u8, depth, acc) in pending:
            rgb = np.asarray(rgb_u8).astype(np.float32) / 255.0
            rgb = rgb.reshape(-1, W_crop, 3)[:rows_this]
            dep = np.asarray(depth).astype(np.float32).reshape(-1, W_crop)[:rows_this]
            ac = np.asarray(acc).astype(np.float32).reshape(-1, W_crop)[:rows_this]
            fr0, _, fc0, fc1 = [int(v) for v in rects[k]]
            w = feathers[k][r0 - fr0:r0 - fr0 + rows_this]
            # the quantized crop may extend past the feather rect on either
            # side — accumulate only the rect's own columns
            cw0 = max(c0, fc0)
            cw1 = min(c0 + W_crop, fc1)
            wslice = w[:, cw0 - fc0:cw1 - fc0]
            sl_r = slice(r0, r0 + rows_this)
            sl_c = slice(cw0, cw1)
            src_c = slice(cw0 - c0, cw1 - c0)
            wk = wslice * (ac[:, src_c] + acc_eps)  # opacity-weighted stitch
            rgb_acc[sl_r, sl_c] += wk[..., None] * rgb[:, src_c]
            depth_acc[sl_r, sl_c] += wk * dep[:, src_c]
            acc_acc[sl_r, sl_c] += wk * ac[:, src_c]
            w_acc[sl_r, sl_c] += wk
        wsafe = np.maximum(w_acc, 1e-8)[..., None]
        rgb = np.clip(rgb_acc / wsafe, 0.0, 1.0)
        depth = (depth_acc / wsafe[..., 0]).reshape(-1)
        acc = (acc_acc / wsafe[..., 0]).reshape(-1)
        return rgb, depth, acc
