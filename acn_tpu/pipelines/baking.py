"""Baked (amortized) serving path: distill the trained field into a dense
voxel table and render it with NO per-sample hash gathers or MLP evals.

Why this exists (BASELINE.md "30 FPS" analysis): live rendering is bound by
hash-table gather rows — ~66 M rows for one 1080p frame against a measured
~0.1–0.3 B rows/s single-chip ceiling, so no amount of scheduling reaches
30 FPS through the live field. The reference hits the same wall (its viewer
serves ~1 FPS previews, viewer/viewer.py:112-113) and stops there. The
standard escape — PlenOctree/SNeRG-style baking — precomputes σ and color
onto a regular grid once, after which a frame costs 8 *regular* trilinear
gathers per sample from ONE table (vs 8 rows × L hash levels + two MLPs),
plus nothing at all in empty space.

TPU-shaped choices:

* the table is a flat ``(R³, 4)`` row array ``[r, g, b, σ]`` — one gather
  row per corner, features packed (same layout lesson as the 'cell' hash:
  row count, not row width, is what costs);
* empty-space skipping reuses the *existing* budget marcher: baking also
  emits a standard occupancy state (binaries = σ-maxpool > threshold), so
  ``march_rays_budget`` + ``composite_packed`` serve unchanged;
* view dependence is baked as real spherical harmonics: ``sh_degree=0``
  (diffuse mean over ``bake_dirs`` directions, 4 channels) or
  ``sh_degree=1`` (SNeRG/PlenOctree-style, 13 channels: 4 SH coefficients
  × rgb + σ). On this TPU the choice is almost free at serving time —
  gathers are ROW-COUNT-bound and width-independent (docs/hashgrid_kernel_memo.md
  measurements), so SH-1 widens the gathered rows without adding gathers;
  the cost is table memory (512³: 2.1 → 7.0 GB f32) and a per-sample
  4-term dot at decode. City-scale aerial content is mostly matte, so the
  diffuse default is measured, not assumed — the bake PSNR-vs-live number
  comes from ``scripts/bench_render.py --baked``.

Reference counterpart: none (the reference has no amortized serving path);
call sites it replaces: nerfs/ray_rendering.py:577-627 at serving time.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.nerfs.render import (
    bg_default_color,
    composite,
    composite_packed,
    render_weights_from_density,
)
from acn_tpu.occupancy import grid as occ_grid
from acn_tpu.occupancy.grid import OccConfig

Array = jnp.ndarray


# ============================ baking ============================


def _lattice_points(aabb: np.ndarray, R: int, flat_lo: int, flat_hi: int
                    ) -> np.ndarray:
    """Lattice points [flat_lo, flat_hi) of the R³ grid, in x-major flat
    order (ix·R + iy)·R + iz — host-side numpy (one-time prep; the remote
    tunnel punishes device round trips for generation-only work)."""
    idx = np.arange(flat_lo, flat_hi, dtype=np.int64)
    iz = idx % R
    iy = (idx // R) % R
    ix = idx // (R * R)
    u = np.stack([ix, iy, iz], axis=-1).astype(np.float32) / max(R - 1, 1)
    lo, hi = np.asarray(aabb[0], np.float32), np.asarray(aabb[1], np.float32)
    return lo + u * (hi - lo)


def fibonacci_dirs(n: int) -> np.ndarray:
    """n roughly-uniform unit directions (Fibonacci sphere) for the diffuse
    bake average."""
    i = np.arange(n, dtype=np.float32) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi),
         np.cos(phi)], axis=-1
    ).astype(np.float32)


# real SH basis constants (degree 0 + the three degree-1 terms)
_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199


def sh1_basis(dirs: Array) -> Array:
    """(…, 3) unit directions → (…, 4) real-SH basis [Y00, Y1-1, Y10, Y11]
    = [c0, c1·y, c1·z, c1·x] (the standard real-SH ordering)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [jnp.full_like(x, _SH_C0), _SH_C1 * y, _SH_C1 * z, _SH_C1 * x],
        axis=-1,
    )


def decode_sh1(coeffs: Array, dirs: Array) -> Array:
    """(B, 12) SH-1 coefficients ([4 basis × 3 rgb], basis-major) + (B, 3)
    view directions → (B, 3) rgb in [0, 1]."""
    b = sh1_basis(dirs)  # (B, 4)
    rgb = jnp.einsum("bk,bkc->bc", b, coeffs.reshape(-1, 4, 3))
    return jnp.clip(rgb, 0.0, 1.0)


def bake_field(
    field_fn,  # (M, 6) [xyz, dir] → (σ (M,), rgb (M, 3))
    aabb,  # (2, 3)
    resolution: int,
    *,
    bake_dirs: int = 4,
    chunk: int = 2**18,
    occ_resolution: int = 128,
    occ_thre: float = 5e-3,
    dtype=jnp.float32,
    sh_degree: int = 0,
    supersample: int = 1,
    params=None,
) -> Dict[str, Any]:
    """Evaluate ``field_fn`` over the R³ lattice → baked serving asset.

    ``params``: optional pytree of field parameters, passed through jit as
    an ARGUMENT — ``field_fn(params, xd)`` is called instead of
    ``field_fn(xd)``. Real fields (the restored flagship container is
    ~0.5 GB of hash tables) MUST use this: a field_fn closure over device
    arrays bakes them into the lowered program as constants, and the axon
    remote-compile RPC rejects the resulting request (HTTP 413 — observed
    on the first real-checkpoint bake, round 5).

    Returns {"table": (R³, F), "aabb": (2, 3), "resolution": R, "sh_degree",
    "occ_state": occupancy-state pytree for march_rays_budget}; F = 4
    ([rgb, σ], ``sh_degree=0``) or 13 ([12 SH-1 rgb coefficients, σ]).

    σ is direction-independent (averaged over the sample directions); rgb
    is either averaged (degree 0) or least-squares-projected onto the SH-1
    basis over ``bake_dirs`` Fibonacci directions (≥ 8 enforced for a
    well-conditioned degree-1 projection). ``supersample=s`` anti-aliases
    the distillation (SNeRG-style): each table entry averages the field
    over an s³ sub-lattice of its voxel neighborhood instead of one point
    sample — s³× the bake evals, zero extra table memory (the averaging
    happens inside the chunk eval), and thin structures stop shimmering
    under trilinear reconstruction. Evaluation is chunked and jitted once;
    the table assembles on host (numpy) so arbitrarily large bakes never
    hold 2 copies in HBM.
    """
    R = int(resolution)
    sh_degree = int(sh_degree)
    if sh_degree not in (0, 1):
        raise ValueError(f"sh_degree must be 0 or 1, got {sh_degree}")
    aabb_np = np.asarray(aabb, np.float32)
    ss = max(int(supersample), 1)
    if ss > 1:
        sub = (np.stack(
            np.meshgrid(*([np.arange(ss, dtype=np.float32)] * 3),
                        indexing="ij"), axis=-1).reshape(-1, 3) + 0.5) / ss - 0.5
        voxel = (aabb_np[1] - aabb_np[0]) / max(R - 1, 1)
        sub_w = (sub * voxel[None, :]).astype(np.float32)  # (ss³, 3) world
    n_dirs = max(int(bake_dirs), 1 if sh_degree == 0 else 8)
    dirs = fibonacci_dirs(n_dirs)
    if sh_degree:
        # least-squares projection rgb(d) ≈ Σ_k coeff_k · Y_k(d):
        # coeffs = pinv(B) @ rgb over the sampled directions (host-side,
        # tiny); shipped into the jitted eval as a (4, D) constant.
        B = np.asarray(sh1_basis(jnp.asarray(dirs)))  # (D, 4)
        proj = np.linalg.pinv(B).astype(np.float32)  # (4, D)

    @jax.jit
    def eval_chunk(p, x):  # (C, 3) → (C, F)
        C = x.shape[0]
        if ss > 1:  # voxel-neighborhood sub-lattice, averaged below
            x = (x[:, None, :] + jnp.asarray(sub_w)[None, :, :]).reshape(-1, 3)

        def one_dir(d):
            xd = jnp.concatenate(
                [x, jnp.broadcast_to(d[None, :], x.shape)], axis=-1)
            sigma, rgb = field_fn(p, xd) if params is not None else field_fn(xd)
            if ss > 1:
                sigma = jnp.mean(sigma.reshape(C, ss**3), axis=1)
                rgb = jnp.mean(rgb.reshape(C, ss**3, 3), axis=1)
            return sigma, rgb

        sig, rgb = jax.vmap(one_dir)(jnp.asarray(dirs))  # (D, C) / (D, C, 3)
        sig = jnp.mean(sig, axis=0)[:, None]
        if sh_degree == 0:
            return jnp.concatenate([jnp.mean(rgb, axis=0), sig], axis=-1)
        coef = jnp.einsum("kd,dcj->ckj", jnp.asarray(proj), rgb)  # (C, 4, 3)
        return jnp.concatenate([coef.reshape(C, 12), sig], axis=-1)

    n = R * R * R
    F = 4 if sh_degree == 0 else 13
    table = np.empty((n, F), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        x = _lattice_points(aabb_np, R, s, e)
        if e - s < chunk:  # pad to the fixed jit shape
            x = np.concatenate(
                [x, np.zeros((chunk - (e - s), 3), np.float32)])
        table[s:e] = np.asarray(eval_chunk(params, jnp.asarray(x)))[: e - s]

    return pack_baked(table, aabb_np, R, occ_resolution=occ_resolution,
                      occ_thre=occ_thre, dtype=dtype, sh_degree=sh_degree)


def pack_baked(table: np.ndarray, aabb: np.ndarray, R: int, *,
               occ_resolution: int = 128, occ_thre: float = 5e-3,
               dtype=jnp.float32, sh_degree: int = 0) -> Dict[str, Any]:
    """Assemble the serving asset from a raw (R³, F) table (σ in the last
    channel): clip color (degree 0 only — SH coefficients may be negative;
    decode_sh1 clips after evaluation), derive the marching occupancy
    (σ max-pooled onto the occ grid, so a cell is occupied iff ANY covered
    voxel could contribute alpha)."""
    sigma = table[:, -1].reshape(R, R, R)
    Ro = int(min(occ_resolution, R))
    f = R // Ro
    if f * Ro != R:
        Ro = R  # non-divisible: occupancy at bake resolution
        f = 1
    pooled = sigma.reshape(Ro, f, Ro, f, Ro, f).max(axis=(1, 3, 5))
    # a voxel's support spans its 8 neighboring cells — dilate by 1 so
    # boundary samples of an occupied voxel are never culled
    occ = pooled > occ_thre
    for ax in (0, 1, 2):
        occ = occ | np.roll(occ, 1, ax) | np.roll(occ, -1, ax)
    occ_cfg = OccConfig(resolution=Ro, levels=1)
    state = occ_grid.init_occ_state(jnp.asarray(aabb, jnp.float32), occ_cfg)
    state = {**state, "binaries": jnp.asarray(occ[None], bool)}
    if sh_degree == 0:
        packed = np.concatenate(
            [np.clip(table[:, :3], 0.0, 1.0), table[:, 3:4]], axis=-1)
    else:
        packed = table
    return {
        "table": jnp.asarray(packed, dtype),
        "aabb": jnp.asarray(aabb, jnp.float32),
        "resolution": R,
        "sh_degree": int(sh_degree),
        "occ_state": state,
        "occ_cfg": occ_cfg,
    }


def bake_container(variables, cfg, *, resolution: int, aabb=None,
                   bake_dirs: int = 4, chunk: int = 2**18,
                   occ_resolution: int = 128, occ_thre: float = 5e-3,
                   dtype=jnp.float32, sh_degree: int = 0,
                   supersample: int = 1) -> Dict[str, Any]:
    """Bake the full soft-MoE container (the flagship field) over its global
    AABB. The σ-weighted expert blend is evaluated exactly as the live
    renderer does (render_occ._soft_moe_eval), so the bake differs from the
    live field only by lattice resolution and the diffuse average."""
    from acn_tpu.nerfs.render_occ import _soft_moe_eval

    if aabb is None:
        aabb = np.asarray(variables["buffers"]["global_aabb"])

    def field_fn(v, xd):
        # v flows through jit as an argument — never close over the
        # container (≈0.5 GB of tables ⇒ remote-compile HTTP 413)
        sigma, rgb = _soft_moe_eval(v, cfg, xd)
        return sigma, rgb

    return bake_field(field_fn, aabb, resolution, bake_dirs=bake_dirs,
                      chunk=chunk, occ_resolution=occ_resolution,
                      occ_thre=occ_thre, dtype=dtype, sh_degree=sh_degree,
                      supersample=supersample, params=variables)


def save_baked(path, baked: Dict[str, Any]) -> None:
    """Persist the serving asset as one .npz (atomic tmp+rename)."""
    import os

    st = baked["occ_state"]
    tmp = str(path) + ".tmp"
    np.savez_compressed(
        tmp if str(tmp).endswith(".npz") else tmp,
        table=np.asarray(baked["table"], np.float32),
        aabb=np.asarray(baked["aabb"], np.float32),
        resolution=np.int32(baked["resolution"]),
        occ_binaries=np.asarray(st["binaries"]),
        occ_resolution=np.int32(baked["occ_cfg"].resolution),
        sh_degree=np.int32(baked.get("sh_degree", 0)),
    )
    # numpy appends .npz to names without it
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, str(path))


def load_baked(path) -> Dict[str, Any]:
    with np.load(path) as z:
        R = int(z["resolution"])
        aabb = z["aabb"]
        occ_cfg = OccConfig(resolution=int(z["occ_resolution"]), levels=1)
        state = occ_grid.init_occ_state(jnp.asarray(aabb), occ_cfg)
        state = {**state, "binaries": jnp.asarray(z["occ_binaries"])}
        return {
            "table": jnp.asarray(z["table"]),
            "aabb": jnp.asarray(aabb),
            "resolution": R,
            "sh_degree": int(z["sh_degree"]) if "sh_degree" in z else 0,
            "occ_state": state,
            "occ_cfg": occ_cfg,
        }


# ============================ serving ============================


def trilinear_lookup(table: Array, aabb: Array, R: int, x: Array) -> Array:
    """(B, 3) positions → (B, 4) [rgb, σ] by trilinear interpolation of the
    flat (R³, 4) table (values live AT lattice points). 8 packed-row
    gathers + lerps — the entire per-sample cost of the baked field."""
    lo, hi = aabb[0], aabb[1]
    u = (x - lo) / jnp.maximum(hi - lo, 1e-12) * (R - 1)
    u = jnp.clip(u, 0.0, R - 1 - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - i0.astype(u.dtype)).astype(table.dtype)  # (B, 3)

    base = (i0[:, 0] * R + i0[:, 1]) * R + i0[:, 2]  # (B,)
    out = None
    for cx in (0, 1):
        wx = (1.0 - f[:, 0]) if cx == 0 else f[:, 0]
        for cy in (0, 1):
            wy = (1.0 - f[:, 1]) if cy == 0 else f[:, 1]
            for cz in (0, 1):
                wz = (1.0 - f[:, 2]) if cz == 0 else f[:, 2]
                idx = base + (cx * R + cy) * R + cz
                v = jnp.take(table, idx, axis=0)  # (B, 4)
                w = (wx * wy * wz)[:, None]
                out = v * w if out is None else out + v * w
    return out


def pack_zpairs(table: Array, R: int) -> Array:
    """(R³, F) → (R³, 2F) where row i carries [v(i), v(i + ẑ)] — both
    z-corners of any cell land in ONE gathered row. Hash/table gathers on
    this TPU are ROW-COUNT-bound and width-independent (docs/hashgrid_kernel_memo.md
    measurements), so doubling row width to halve row count (8 → 4
    gathers/sample) is a straight ~2× on the serving hot loop, at 2×
    table memory (512³ f32: 2.1 → 4.3 GB, still comfortably in HBM)."""
    nxt = jnp.concatenate([table[1:], table[-1:]], axis=0)  # v(i+1) along z
    return jnp.concatenate([table, nxt], axis=-1)  # (R³, 2F)


def trilinear_lookup_zpair(table2: Array, aabb: Array, R: int,
                           x: Array) -> Array:
    """trilinear_lookup over a pack_zpairs table: 4 gathered rows per
    sample (the z-lerp happens inside each row)."""
    F = table2.shape[-1] // 2
    lo, hi = aabb[0], aabb[1]
    u = (x - lo) / jnp.maximum(hi - lo, 1e-12) * (R - 1)
    u = jnp.clip(u, 0.0, R - 1 - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - i0.astype(u.dtype)).astype(table2.dtype)  # (B, 3)

    base = (i0[:, 0] * R + i0[:, 1]) * R + i0[:, 2]
    fz = f[:, 2:3]
    out = None
    for cx in (0, 1):
        wx = (1.0 - f[:, 0]) if cx == 0 else f[:, 0]
        for cy in (0, 1):
            wy = (1.0 - f[:, 1]) if cy == 0 else f[:, 1]
            idx = base + (cx * R + cy) * R
            v2 = jnp.take(table2, idx, axis=0)  # (B, 2F)
            v = v2[:, :F] * (1.0 - fz) + v2[:, F:] * fz  # in-row z-lerp
            w = (wx * wy)[:, None]
            out = v * w if out is None else out + v * w
    return out


def render_baked_rays(
    baked: Dict[str, Any],
    rays: Array,  # (N, 8)
    *,
    s_max: int = 128,
    budget_per_ray: int = 32,
    alpha_thre: float = 0.0,
    key: Optional[jax.Array] = None,
    bg_rgb: Optional[Array] = None,
    s_coarse: int = 0,
) -> Tuple[Array, Array, Array, Array]:
    """Budget-marched rendering of the baked table (the serving hot path):
    march_rays_budget over the baked occupancy → ONE trilinear lookup per
    packed sample → composite_packed. Returns (rgb, depth, extras, acc) —
    the same convention as render_expert_occ_budget. ``s_coarse`` enables
    the coarse range-finding pre-pass (occupancy/grid.coarse_ray_range):
    spend s_coarse cheap bin tests to concentrate s_max fine bins on the
    occupied span — lets serving run a much smaller s_max.

    ``budget_per_ray=0`` switches to the UNBIASED per-ray strided marcher
    (march_rays, even-stride compaction to ``s_max`` kept samples) — the
    same escape hatch training grew in round 5: on dense occupancy the
    global budget pack drops valid samples batch-tail-first, which in a
    frame render shows up as background-filled row tails (round-6: the
    real field's baked grid budget-starved full-image eval down to
    5.45 dB; strided scoring is bias-free at any density). Use budget for
    FPS-critical preview, strided for quality scoring."""
    if budget_per_ray == 0:
        samples = occ_grid.march_rays(
            baked["occ_state"], rays, baked["occ_cfg"],
            max(s_max * 4, 128), s_max, key=key,
        )
        x = samples["positions"]  # (N, S, 3)
        flat = x.reshape(-1, 3)
        if "table_z" in baked:
            v = trilinear_lookup_zpair(
                baked["table_z"], baked["aabb"], baked["resolution"], flat
            ).astype(jnp.float32)
        else:
            v = trilinear_lookup(
                baked["table"], baked["aabb"], baked["resolution"], flat
            ).astype(jnp.float32)
        v = v.reshape(x.shape[0], x.shape[1], -1)
        if int(baked.get("sh_degree", 0)) == 1:
            d = jnp.broadcast_to(rays[:, None, 3:6], x.shape).reshape(-1, 3)
            rgbs = decode_sh1(v.reshape(-1, v.shape[-1])[:, :12], d).reshape(
                x.shape[0], x.shape[1], 3)
        else:
            rgbs = v[..., :3]
        sigmas = jnp.maximum(v[..., -1], 0.0)
        mask = samples["mask"]
        if alpha_thre > 0.0:
            dt = jnp.maximum(samples["dts"], 0.0)
            alpha = 1.0 - jnp.exp(-sigmas * dt)
            mask = mask & (alpha >= alpha_thre)
        weights, _ = render_weights_from_density(
            samples["t_starts"], samples["t_ends"], sigmas,
            sample_mask=mask, dts=samples["dts"],
        )
        t_mid = 0.5 * (samples["t_starts"] + samples["t_ends"])
        rgb_map, depth, acc = composite(weights, rgbs, t_mid, bg_rgb=bg_rgb)
        return rgb_map, depth, weights, acc

    samples = occ_grid.march_rays_budget(
        baked["occ_state"], rays, baked["occ_cfg"], s_max, budget_per_ray,
        key=key, s_coarse=s_coarse,
    )
    if "table_z" in baked:  # z-pair packed: 4 gathered rows/sample
        v = trilinear_lookup_zpair(
            baked["table_z"], baked["aabb"], baked["resolution"],
            samples["xd"][:, :3],
        ).astype(jnp.float32)
    else:
        v = trilinear_lookup(
            baked["table"], baked["aabb"], baked["resolution"],
            samples["xd"][:, :3],
        ).astype(jnp.float32)
    if int(baked.get("sh_degree", 0)) == 1:
        # interpolate-then-decode ≡ decode-then-interpolate (both linear);
        # the view direction rides along in the packed samples
        rgb = decode_sh1(v[:, :12], samples["xd"][:, 3:6])
    else:
        rgb = v[:, :3]
    rgb_map, depth, acc, extras = composite_packed(
        jnp.maximum(v[:, -1], 0.0), rgb, samples, rays.shape[0],
        bg_rgb=bg_rgb, alpha_thre=alpha_thre,
    )
    return rgb_map, depth, extras, acc


class BakedRenderer:
    """Frame renderer over a baked asset — same dispatch conventions as
    pipelines.renderer.Renderer (device-side ray gen, fixed-shape row
    chunks, async dispatch + single sync, optional row-block mesh
    sharding), with the baked lookup as the field."""

    def __init__(self, baked: Dict[str, Any], *, s_max: int = 128,
                 budget_per_ray: int = 32, chunk_points: int = 4_000_000,
                 bg_color: str = "white", zpair: bool = True,
                 s_coarse: int = 0):
        if zpair and "table_z" not in baked:
            baked = {
                **baked,
                "table_z": pack_zpairs(baked["table"], baked["resolution"]),
            }
        self.baked = baked
        self.s_max = int(s_max)
        self.budget = int(budget_per_ray)
        self.s_coarse = int(s_coarse)
        self.chunk_points = int(chunk_points)
        # 'random' backgrounds are a train-time regularizer (stop experts
        # painting the sky); a frozen serving asset renders deterministically
        self.bg_color = "white" if bg_color == "random" else bg_color
        self._jitted = {}

    def _fn(self, W: int, rows: int, mesh=None):
        key_ = (W, rows, None if mesh is None
                else tuple(d.id for d in mesh.devices.flat))
        if key_ in self._jitted:
            return self._jitted[key_]

        from acn_tpu.pipelines.renderer import _pinhole_block_rays

        bg = self.bg_color
        # static (non-array) members of the asset are closed over; only the
        # array leaves (table, aabb, occ_state) flow through jit
        occ_cfg = self.baked["occ_cfg"]
        resolution = self.baked["resolution"]
        sh_degree = int(self.baked.get("sh_degree", 0))

        def block(arrs, c2w, intr, aabb, nf, row0, col0):
            baked = {**arrs, "occ_cfg": occ_cfg, "resolution": resolution,
                     "sh_degree": sh_degree}
            rays = _pinhole_block_rays(rows, W, c2w, intr, aabb, nf, row0,
                                       col0)
            bg_rgb = bg_default_color(None, rays.shape[0], bg)
            rgb, depth, _, acc = render_baked_rays(
                baked, rays, s_max=self.s_max, budget_per_ray=self.budget,
                bg_rgb=bg_rgb, s_coarse=self.s_coarse,
            )
            rgb_u8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(
                jnp.uint8)
            return rgb_u8, depth.astype(jnp.float16), acc.astype(jnp.float16)

        if mesh is None:
            fn = jax.jit(block)
            n_dev = 1
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as PS

            axis = mesh.axis_names[0]
            n_dev = mesh.devices.size

            def sharded(arrs, c2w, intr, aabb, nf, row0, col0):
                slot = jax.lax.axis_index(axis).astype(jnp.float32)
                return block(arrs, c2w, intr, aabb, nf, row0 + slot * rows,
                             col0)

            # same rationale as renderer.py's mesh path: pallas outputs
            # lack vma metadata, so the strict check must go only when the
            # segscan kernel backend is active
            from acn_tpu.ops.segscan import resolve_backend

            fn = jax.jit(shard_map(
                sharded, mesh=mesh,
                in_specs=(PS(),) * 7,
                out_specs=(PS(axis), PS(axis), PS(axis)),
                check_vma=resolve_backend() == "xla",
            ))
        self._jitted[key_] = (fn, n_dev)
        return fn, n_dev

    def render_image(self, *, H: int, W: int, intrinsics, c2w,
                     key=None, near_far_override=None, download: bool = True,
                     mesh=None):
        per_ray = self.budget if self.budget > 0 else self.s_max
        rows = max(self.chunk_points // (per_ray * W), 1)
        fn, n_dev = self._fn(W, rows, mesh)
        rows_disp = rows * n_dev
        arrs = {k: self.baked[k] for k in ("table", "aabb", "occ_state")
                if k in self.baked}
        if "table_z" in self.baked:  # serve the packed table only
            arrs["table_z"] = self.baked["table_z"]
            arrs.pop("table", None)

        c2w_j = jnp.asarray(np.asarray(c2w, np.float32))
        intr_j = jnp.asarray(np.asarray(intrinsics[:4], np.float32))
        aabb_j = self.baked["aabb"]
        n_o, f_o = (near_far_override or (None, None))
        nf_j = jnp.asarray(
            [n_o if n_o is not None else -np.inf,
             f_o if f_o is not None else np.inf], jnp.float32)

        pending = []
        for r0 in range(0, H, rows_disp):
            pending.append(
                (r0, fn(arrs, c2w_j, intr_j, aabb_j, nf_j,
                        jnp.float32(r0), jnp.float32(0.0))))
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
        return (np.clip(rgb_out, 0, 1).reshape(H, W, 3), depth_out, acc_out)
