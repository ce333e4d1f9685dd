"""Multi-level occupancy grids with static-shape ray marching.

TPU-native replacement for nerfacc's ``OccGridEstimator`` (used by the
reference at models/inr/meta_ngp.py:126-443) and its packed ragged sampling
(reference nerfs/ray_rendering.py:477-487). Design changes for XLA:

* the grid is a dense pytree of arrays — EMA values ``occs`` and boolean
  ``binaries`` of shape ``(levels, R, R, R)`` — updated by a jitted EMA step
  (no CUDA kernels, no dynamic cell lists);
* camera-visibility premarking (``mark_invisible_cells``) is a vectorized
  frustum test over all cell centers (reference meta_ngp.py:260-353 calls
  nerfacc's CUDA version; the math is identical);
* ray marching emits a **fixed** ``(N, S)`` sample layout with a validity
  mask instead of variable-length packed tensors: ``S_max`` uniform bins
  span the *full* per-ray [near, far], occupancy lookups mask them, and an
  **even-stride compaction** keeps every ⌈n_valid/S_kept⌉-th occupied bin
  (interval widths scaled by the stride so opacity stays unbiased). With a
  sharp grid this concentrates all samples in occupied space; with a diffuse
  grid it degrades gracefully to plain stratified sampling over the whole
  ray — never truncating scene content the way a "first-k occupied"
  compaction would. Static shapes everywhere ⇒ one jit compilation.

Level l covers the roi AABB scaled by 2^l around its center (nerfacc
semantics). ``occs < 0`` marks camera-invisible cells which are excluded from
updates and always unoccupied.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclass(frozen=True)
class OccConfig:
    """Occupancy hyperparameters. Defaults mirror the occ_conf dict assembled
    by the reference runner (nerf_runner.py:102-148) and MetaNGP's defaults
    (meta_ngp.py:102-141)."""

    resolution: int = 128
    levels: int = 1  # per-expert rays are clamped to the expert AABB = level 0;
    # extra 2^l-inflated levels (nerfacc's unbounded-scene contraction) only
    # pay off for unclamped global marching — keep them opt-in
    occ_thre: float = 1e-2
    ema_decay: float = 0.95
    warmup_steps: int = 256
    update_interval: int = 16
    alpha_thre: float = 1e-2
    alpha_thre_start: float = 0.0
    cosine_anneal: bool = True
    cone_angle: float = 1.0 / 256.0
    near_plane: float = 0.05
    far_plane: float = 1e3
    render_step_size: Optional[float] = None  # None ⇒ diag(roi)/1000

    def step_size_for(self, aabb) -> float:
        if self.render_step_size is not None:
            return float(self.render_step_size)
        ext = np.asarray(aabb[1]) - np.asarray(aabb[0])
        return float(np.linalg.norm(ext) / 1000.0)

    def step_size_for_traced(self, aabb):
        """Traced-value variant (per-expert AABBs under vmap):
        diag(roi)/1000 unless overridden (reference meta_ngp.py:104-109)."""
        if self.render_step_size is not None:
            return jnp.float32(self.render_step_size)
        return jnp.linalg.norm(aabb[1] - aabb[0]) / 1000.0


def level_aabbs(roi_aabb: Array, levels: int) -> Array:
    """(levels, 2, 3): level l = roi scaled by 2^l around its center."""
    c = 0.5 * (roi_aabb[0] + roi_aabb[1])
    half = 0.5 * (roi_aabb[1] - roi_aabb[0])
    scales = 2.0 ** jnp.arange(levels, dtype=jnp.float32)
    mins = c[None, :] - half[None, :] * scales[:, None]
    maxs = c[None, :] + half[None, :] * scales[:, None]
    return jnp.stack([mins, maxs], axis=1)


def init_occ_state(roi_aabb: Array, cfg: OccConfig) -> Dict[str, Any]:
    """Fresh occupancy state for one expert."""
    R, L = cfg.resolution, cfg.levels
    return {
        "occs": jnp.zeros((L, R, R, R), jnp.float32),
        "binaries": jnp.zeros((L, R, R, R), jnp.bool_),
        "aabbs": level_aabbs(jnp.asarray(roi_aabb, jnp.float32), L),
    }


def cell_centers(state: Dict[str, Any], cfg: OccConfig) -> Array:
    """(L, R³, 3) world-space cell centers per level."""
    R, L = cfg.resolution, cfg.levels
    idx = jnp.stack(
        jnp.meshgrid(*([jnp.arange(R)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (R³, 3) integer coords
    u = (idx.astype(jnp.float32) + 0.5) / R  # cell-center unit coords
    aabbs = state["aabbs"]  # (L, 2, 3)
    return aabbs[:, 0][:, None, :] + u[None, :, :] * (
        aabbs[:, 1] - aabbs[:, 0]
    )[:, None, :]


def _anneal_alpha_thre(cfg: OccConfig, step) -> Array:
    """Alpha-threshold ramp start→end over warmup (reference
    meta_ngp.py:244-258), as a traced value."""
    t = jnp.clip(step / jnp.maximum(1, cfg.warmup_steps - 1), 0.0, 1.0)
    if cfg.cosine_anneal:
        mix = 0.5 * (1.0 - jnp.cos(jnp.pi * t))
    else:
        mix = t
    return (1.0 - mix) * cfg.alpha_thre_start + mix * cfg.alpha_thre


def update_occ_grid(
    state: Dict[str, Any],
    key: jax.Array,
    density_fn: Callable[[Array], Array],  # (M, 3) world → (M,) σ
    cfg: OccConfig,
    step_size: float,
) -> Dict[str, Any]:
    """One EMA occupancy update over *all* cells.

    nerfacc's ``update_every_n_steps`` EMA-updates sampled cells
    (all cells during warmup); on TPU a full dense update is one fused
    elementwise pass plus a batched density eval, so we always update
    everything — simpler and deterministic.

    occ ← max(occ · decay, σ(x_jitter) · step_size); binaries = occ > min(
    occ_thre, mean(occ over visible cells)). Invisible cells (occ < 0) are
    skipped and stay off.
    """
    L, R = cfg.levels, cfg.resolution
    centers = cell_centers(state, cfg)  # (L, R³, 3)
    cell_size = (state["aabbs"][:, 1] - state["aabbs"][:, 0]) / R  # (L, 3)

    jitter = jax.random.uniform(key, centers.shape, minval=-0.5, maxval=0.5)
    x = (centers + jitter * cell_size[:, None, :]).reshape(-1, 3)

    # chunk the density sweep: L·R³ cells at once would materialize
    # multi-GB encoder intermediates (128³·4 levels ≈ 8.4M points)
    block = 262_144
    m = x.shape[0]
    pad = (-m) % block
    x_pad = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
    sigma = jax.lax.map(density_fn, x_pad.reshape(-1, block, 3)).reshape(-1)[:m]
    new_occ = sigma.reshape(L, R * R * R) * step_size

    occs = state["occs"].reshape(L, -1)
    visible = occs >= 0.0
    updated = jnp.maximum(occs * cfg.ema_decay, new_occ)
    occs = jnp.where(visible, updated, occs)

    mean_occ = jnp.sum(jnp.where(visible, occs, 0.0)) / jnp.maximum(
        jnp.sum(visible), 1
    )
    # floor the threshold: occ = σ·Δ < 1e-6 ⇒ alpha < 1e-6, always skippable
    # (also keeps the degenerate all-equal grid numerically stable)
    thre = jnp.maximum(jnp.minimum(cfg.occ_thre, mean_occ), 1e-6)
    binaries = occs > thre

    return {
        "occs": occs.reshape(L, R, R, R),
        "binaries": binaries.reshape(L, R, R, R),
        "aabbs": state["aabbs"],
    }


def mark_invisible_cells(
    state: Dict[str, Any],
    K_mats: Array,  # (C, 3, 3) intrinsics
    c2w_rdf: Array,  # (C, 3, 4) camera-to-world, RDF camera basis
    width: int,
    height: int,
    near_plane: float = 0.0,
    cfg: OccConfig = OccConfig(),
) -> Dict[str, Any]:
    """Mark cells never seen by any camera with occ = −1 (one-time prune).

    Vectorized frustum test replacing nerfacc's CUDA ``mark_invisible_cells``
    (called at reference meta_ngp.py:319-353 with RUB→RDF-converted poses):
    a cell is visible from a camera if its center projects inside the image
    with depth > near_plane.
    """
    centers = cell_centers(state, cfg)  # (L, R³, 3)
    L = centers.shape[0]
    x = centers.reshape(-1, 3)  # (M, 3)
    M = x.shape[0]

    R_wc = c2w_rdf[:, :3, :3]  # (C, 3, 3) cam→world
    t_wc = c2w_rdf[:, :3, 3]  # (C, 3)

    # chunk over cells: the dense (C, M, 3) camera-space tensor for a 128³×L
    # grid and hundreds of cameras would be tens of GB
    block = 65536
    pad = (-M) % block
    x_pad = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)

    def visible_block(xb):  # (B, 3) → (B,) bool
        rel = xb[None, :, :] - t_wc[:, None, :]  # (C, B, 3)
        x_cam = jnp.einsum("cij,cbi->cbj", R_wc, rel)  # world→cam: Rᵀ(x−t)
        z = x_cam[..., 2]  # RDF: +z forward
        uvw = jnp.einsum("cij,cbj->cbi", K_mats, x_cam)
        zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        u = uvw[..., 0] / zs
        v = uvw[..., 1] / zs
        seen = (z > near_plane) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        return jnp.any(seen, axis=0)

    visible = jax.lax.map(
        visible_block, x_pad.reshape(-1, block, 3)
    ).reshape(-1)[:M]

    occs = state["occs"].reshape(-1)
    occs = jnp.where(visible, occs, -1.0)
    R_ = cfg.resolution
    occs = occs.reshape(L, R_, R_, R_)
    return {
        "occs": occs,
        "binaries": state["binaries"] & (occs >= 0),
        "aabbs": state["aabbs"],
    }


# ============================ queries ============================


def occupancy_lookup(state: Dict[str, Any], x: Array) -> Array:
    """Occupied? for world points x (..., 3) using the finest level whose
    AABB contains each point. Points outside all levels → False."""
    aabbs = state["aabbs"]  # (L, 2, 3)
    binaries = state["binaries"]  # (L, R, R, R)
    L = binaries.shape[0]
    R = binaries.shape[1]

    occupied = jnp.zeros(x.shape[:-1], jnp.bool_)
    assigned = jnp.zeros(x.shape[:-1], jnp.bool_)
    for l in range(L):  # levels is small & static — unrolled
        mn, mx = aabbs[l, 0], aabbs[l, 1]
        u = (x - mn) / (mx - mn)
        inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
        idx = jnp.clip((u * R).astype(jnp.int32), 0, R - 1)
        val = binaries[l, idx[..., 0], idx[..., 1], idx[..., 2]]
        take = inside & ~assigned
        occupied = jnp.where(take, val, occupied)
        assigned = assigned | inside
    return occupied


# ============================ marching ============================


def march_t_schedule(
    near: Array,  # (N,)
    far: Array,  # (N,)
    step_size: float,
    cone_angle: float,
    s_max: int,
    key: Optional[jax.Array] = None,
) -> Tuple[Array, Array]:
    """Closed-form cone-scaled t-schedule: t₀ = near, t_{k+1} = t_k +
    max(Δ, c·t_k) — nerfacc's advance rule, vectorized without a scan.

    For t < Δ/c steps are linear; afterwards geometric with ratio (1+c).
    Returns (t0, t1) each (N, s_max); slots past ``far`` are clamped to far
    (zero-length ⇒ zero alpha). Optional stratified jitter shifts the whole
    schedule by u·Δ (training).
    """
    k = jnp.arange(s_max, dtype=jnp.float32)[None, :]  # (1, S)
    near = near[:, None]
    far_c = far[:, None]

    if key is not None:
        u = jax.random.uniform(key, near.shape, dtype=jnp.float32)
        near = near + u * step_size

    if cone_angle <= 0.0:
        t0 = near + k * step_size
        t1 = t0 + step_size
    else:
        c = cone_angle
        t_switch = step_size / c  # where max() flips to the geometric regime
        m = jnp.maximum(jnp.ceil((t_switch - near) / step_size), 0.0)  # (N, 1)
        lin = near + k * step_size
        t_m = near + m * step_size
        geo = t_m * (1.0 + c) ** (k - m)
        t0 = jnp.where(k <= m, lin, geo)
        t1 = t0 + jnp.maximum(step_size, t0 * c)

    t0 = jnp.minimum(t0, far_c)
    t1 = jnp.minimum(t1, far_c)
    return t0, t1


def compact_samples(valid: Array, s_kept: int) -> Tuple[Array, Array]:
    """Per-ray stable compaction: indices of the first ``s_kept`` valid
    samples (N, s_kept) and their validity mask — static shapes.

    Sort-free: the k-th valid sample's output slot is its exclusive prefix
    count, written with a dropping scatter. (A per-ray argsort compiles into
    an enormous sorting network on TPU — 100s of seconds of XLA time — while
    cumsum+scatter compiles instantly and runs faster.)"""
    n, s_max = valid.shape
    counts = jnp.cumsum(valid, axis=1)  # inclusive prefix counts
    pos = jnp.where(valid, counts - 1, s_kept)  # target slot; invalid → dropped
    src = jnp.broadcast_to(jnp.arange(s_max, dtype=jnp.int32), (n, s_max))

    idx = jax.vmap(
        lambda p, s: jnp.zeros(s_kept, jnp.int32).at[p].set(s, mode="drop")
    )(pos, src)
    num_valid = counts[:, -1]
    kept_valid = (
        jnp.arange(s_kept, dtype=counts.dtype)[None, :] < num_valid[:, None]
    )
    return idx, kept_valid


def compact_samples_strided(
    valid: Array, s_kept: int, key: Optional[jax.Array] = None
) -> Tuple[Array, Array, Array]:
    """Even-stride compaction: keep every ⌈n_valid/s_kept⌉-th valid sample.

    Unlike ``compact_samples`` (first-k), this never truncates ray coverage:
    rays with more occupied bins than ``s_kept`` are *subsampled evenly*
    along their whole valid extent, and the returned per-ray ``scale``
    (= the stride) lets the renderer widen each kept interval so expected
    opacity stays unbiased. With ``key``, the stride phase is randomized
    per ray (the occupancy-path analogue of stratified jitter).

    Returns (idx (N, s_kept) int32, mask (N, s_kept) bool, scale (N,) f32).
    """
    n, s_max = valid.shape
    counts = jnp.cumsum(valid.astype(jnp.int32), axis=1)  # inclusive
    n_valid = counts[:, -1]  # (N,)
    stride = jnp.maximum(1, -(-n_valid // s_kept))  # ceil div, (N,)

    rank = counts - 1  # a valid sample's rank among valid ones
    if key is not None:
        phase = jax.random.randint(key, (n,), 0, 1 << 30) % stride
    else:
        phase = jnp.zeros((n,), jnp.int32)
    rel = rank - phase[:, None]
    take = valid & (rel >= 0) & (rel % stride[:, None] == 0)
    slot = rel // stride[:, None]  # < s_kept by construction

    pos = jnp.where(take, slot, s_kept)  # non-kept → dropped by scatter
    src = jnp.broadcast_to(jnp.arange(s_max, dtype=jnp.int32), (n, s_max))
    idx = jax.vmap(
        lambda p, s: jnp.zeros(s_kept, jnp.int32).at[p].set(s, mode="drop")
    )(pos, src)

    kept = jnp.maximum(-(-(n_valid - phase) // stride), 0)
    mask = jnp.arange(s_kept, dtype=jnp.int32)[None, :] < kept[:, None]
    return idx, mask, stride.astype(jnp.float32)


def coarse_ray_range(
    state: Dict[str, Any],
    o: Array,  # (N, 3)
    d: Array,  # (N, 3)
    near: Array,  # (N,)
    far: Array,  # (N,)
    s_coarse: int = 32,
    pool_to: int = 32,
    dilate: int = 2,
) -> Tuple[Array, Array]:
    """Tighten per-ray [near, far] to the span of occupied space — the
    cheap range-finding pre-pass in front of ``march_rays_budget``.

    Serving frames spend most of their gather rows on bin *tests*
    (BASELINE.md round-4 accounting: 133 M bin tests vs 66 M table lookups
    per 1080p baked frame): uniform bins span the whole ray while the
    occupied content (a city terrain slab) usually covers a fraction of
    it. This tests ``s_coarse`` midpoints per ray against a max-pooled +
    dilated copy of the occupancy — conservative by construction: a pooled
    cell is occupied iff ANY covered fine cell is, and ``dilate`` pooled
    cells of dilation cover segment-vs-midpoint deviation, so no fine
    occupied bin can fall outside the returned range (property-tested in
    tests/test_occupancy.py). The fine march then concentrates its bins
    inside [near', far'] — equal sampling density from fewer bins. Rays
    whose coarse tests all miss return an empty interval at ``far``.

    O(N·s_coarse) extra gather rows + one tiny pooled grid; worth it when
    it lets the caller shrink ``s_max`` by more than ``s_coarse`` bins.
    """
    binaries = state["binaries"]  # (L, R, R, R)
    L, R = binaries.shape[0], binaries.shape[1]
    Rc = min(int(pool_to), R)
    f = R // Rc
    if f * Rc != R:
        Rc, f = R, 1
    pooled = binaries.reshape(L, Rc, f, Rc, f, Rc, f).max(axis=(2, 4, 6))
    for _ in range(int(dilate)):
        for ax in (1, 2, 3):
            # jnp.roll wraps — cross-boundary dilation only ADDS occupancy
            # (conservative; costs a sliver of range tightness at the faces)
            pooled = pooled | jnp.roll(pooled, 1, ax) | jnp.roll(pooled, -1, ax)
    cstate = {"aabbs": state["aabbs"], "binaries": pooled}

    e = jnp.linspace(0.0, 1.0, s_coarse + 1, dtype=jnp.float32)[None, :]
    edges = near[:, None] * (1.0 - e) + far[:, None] * e  # (N, S+1)
    # two probes per bin (1/4 and 3/4 points): worst-case distance from a
    # ray/occupancy crossing to the nearest probe is bin_len/4 — with the
    # default dilation this stays conservative out to bin lengths of
    # ~8 pooled cells (vs 4 for midpoint-only), i.e. ray ranges several
    # times the grid AABB at s_coarse=32
    t0c, t1c = edges[:, :-1], edges[:, 1:]
    ta = t0c + 0.25 * (t1c - t0c)
    tb = t0c + 0.75 * (t1c - t0c)
    xa = o[:, None, :] + d[:, None, :] * ta[..., None]
    xb = o[:, None, :] + d[:, None, :] * tb[..., None]
    occ = (occupancy_lookup(cstate, xa) | occupancy_lookup(cstate, xb)) & (
        far[:, None] > near[:, None])
    any_occ = jnp.any(occ, axis=1)
    first = jnp.argmax(occ, axis=1)
    last = (s_coarse - 1) - jnp.argmax(occ[:, ::-1], axis=1)
    lo = jnp.maximum(first - 1, 0)  # pad one coarse bin each side
    hi = jnp.minimum(last + 2, s_coarse)
    near2 = jnp.take_along_axis(edges, lo[:, None], axis=1)[:, 0]
    far2 = jnp.take_along_axis(edges, hi[:, None], axis=1)[:, 0]
    near2 = jnp.where(any_occ, near2, far)
    far2 = jnp.where(any_occ, far2, far)
    return near2, far2


def march_rays_budget(
    state: Dict[str, Any],
    rays: Array,  # (N, 8)
    cfg: OccConfig,
    s_max: int,
    budget_per_ray: int,
    key: Optional[jax.Array] = None,
    extra_valid_fn: Optional[Callable[[Array], Array]] = None,
    s_coarse: int = 0,
) -> Dict[str, Array]:
    """Occupancy marching with a **global cross-ray sample budget** — the
    MoE-capacity-factor pattern applied to volume rendering.

    Per-ray fixed layouts (march_rays) must provision ``s_kept`` model
    evaluations per ray even when the sharp occupancy grid leaves most rays
    with far fewer valid samples — masked slots still pay full MLP + hash
    traffic. Here ALL valid samples across the batch pack into ONE buffer of
    ``B = N·budget_per_ray`` positions via an exclusive cumsum over the flat
    validity mask; the model evaluates exactly B points, and per-(ray,
    sample) results gather back by global position for compositing over the
    full (N, s_max) bin layout (no stride scaling — every surviving sample
    keeps its own bin width). Samples past the budget are dropped
    batch-tail-first (capacity overflow, like MoE token dropping); size the
    budget ≥ the expected mean valid count and overflow is rare.

    Returns {xd (B, 6), t0_b/t1_b (B,), ray_id (B,), slot_real (B,),
    ray_start (N,), gpos (N, s_max), valid (N, s_max), t_starts/t_ends
    (N, s_max), overflow (scalar fraction)}. The B-shaped fields feed
    ``render.composite_packed`` — compositing never touches the dense
    (N, s_max) grid; the N·s_max-shaped fields exist for diagnostics/tests
    and are dead-code-eliminated when unused.
    """
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    near = jnp.maximum(near, cfg.near_plane)
    far = jnp.minimum(far, cfg.far_plane)
    far = jnp.maximum(far, near)
    if s_coarse:  # trace-time branch: s_coarse=0 (training) leaves HLO as-is
        near, far = coarse_ray_range(state, o, d, near, far, s_coarse)

    N = rays.shape[0]
    B = N * int(budget_per_ray)

    # Everything on the dense (N, s_max) side must stay O(rows × 4 B): at
    # frame scale (N ≈ 500k, s_max 256 ⇒ 126M bins/chunk) an earlier version
    # scattered a 9-column f32 payload (x, d, t0, t1, rid) through the pack —
    # 4.4 GB of scatter traffic, ~14 s/chunk on v5e. Instead the pack
    # scatters ONE int32 flat index per kept sample and the B packed rows
    # reconstruct their geometry from (ray, slot) arithmetic; per-bin jitter
    # comes from a counter hash so the reconstruction reproduces the exact
    # jittered point the validity test sampled without materializing an
    # (N, s_max) uniform tensor.
    def _u01(idx, salt):  # idx int32 (...,) → deterministic U[0,1)
        h = (idx.astype(jnp.uint32) + salt) * jnp.uint32(0x9E3779B1)
        h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
        h = (h ^ (h >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> jnp.uint32(16))
        return (h >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))

    e = jnp.linspace(0.0, 1.0, s_max + 1, dtype=jnp.float32)[None, :]
    edges = near[:, None] * (1.0 - e) + far[:, None] * e
    t0, t1 = edges[:, :-1], edges[:, 1:]
    flat_ids = (
        jnp.arange(N, dtype=jnp.int32)[:, None] * s_max
        + jnp.arange(s_max, dtype=jnp.int32)[None, :]
    )  # (N, s_max); N·s_max must stay < 2^31 (2M rays × 256 bins is fine)
    if key is not None:
        salt = jax.random.randint(
            key, (), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.uint32)
        u = _u01(flat_ids, salt)
    else:
        salt, u = None, 0.5
    t_s = t0 + u * (t1 - t0)
    x = o[:, None, :] + d[:, None, :] * t_s[..., None]  # (N, s_max, 3), fused

    valid = (t1 > t0) & occupancy_lookup(state, x)
    if extra_valid_fn is not None:
        valid = valid & extra_valid_fn(x)

    # two-level prefix sum (minor-axis scan + tiny (N,) scan) — a flat
    # N·s_max global cumsum is a multi-pass scan over the whole buffer
    counts = jnp.sum(valid, axis=1, dtype=jnp.int32)  # (N,)
    ray_start = jnp.cumsum(counts) - counts  # exclusive, (N,)
    rank = jnp.cumsum(valid, axis=1, dtype=jnp.int32) - 1  # within-ray
    gpos = ray_start[:, None] + rank  # global rank among valid samples
    n_valid = ray_start[-1] + counts[-1]

    keep = valid & (gpos < B)
    slot = jnp.where(keep, gpos, B).reshape(-1)  # B ⇒ dropped
    buffer_idx = (
        jnp.zeros((B,), jnp.int32).at[slot].set(flat_ids.reshape(-1),
                                                mode="drop")
    )

    # B-row geometry reconstruction (elementwise, O(B))
    rid = buffer_idx // s_max
    sl = buffer_idx - rid * s_max
    nr, fr = near[rid], far[rid]
    inv_s = jnp.float32(1.0 / s_max)
    e0 = sl.astype(jnp.float32) * inv_s
    e1 = e0 + inv_s
    t0_b = nr * (1.0 - e0) + fr * e0
    t1_b = nr * (1.0 - e1) + fr * e1
    u_b = _u01(buffer_idx, salt) if salt is not None else 0.5
    t_sb = t0_b + u_b * (t1_b - t0_b)
    xd = jnp.concatenate([o[rid] + d[rid] * t_sb[:, None], d[rid]], axis=-1)

    slot_real = jnp.arange(B, dtype=jnp.int32) < jnp.minimum(n_valid, B)
    overflow = jnp.maximum(n_valid - B, 0) / jnp.maximum(n_valid, 1)
    return {
        "xd": xd,
        "t0_b": t0_b,
        "t1_b": t1_b,
        "ray_id": rid,
        "slot_real": slot_real,
        "ray_start": ray_start,
        "gpos": gpos,
        "valid": keep,
        "t_starts": t0,
        "t_ends": t1,
        "overflow": overflow,
    }


def march_rays(
    state: Dict[str, Any],
    rays: Array,  # (N, 8)
    cfg: OccConfig,
    s_max: int,
    s_kept: int,
    key: Optional[jax.Array] = None,
    extra_valid_fn: Optional[Callable[[Array], Array]] = None,
    report_budget: int = 0,
) -> Dict[str, Array]:
    """Occupancy-guided marching → fixed-layout samples.

    Replaces nerfacc ``OccGridEstimator.sampling`` (reference
    meta_ngp.py:389-443) with a TPU-native scheme: ``s_max`` uniform bins
    span the full per-ray [near, far]; occupancy culls them; even-stride
    compaction (see ``compact_samples_strided``) reduces to ``s_kept``
    model evaluations per ray with interval widths pre-scaled by the
    stride. Returns dict with t_starts/t_ends (N, s_kept) (original bin
    bounds), dts (stride-scaled widths — use these for opacity), positions
    (N, s_kept, 3), and mask (N, s_kept).

    With ``key``: sample positions jitter within bins and the compaction
    phase randomizes (training); without, bin midpoints and phase 0
    (deterministic rendering).

    ``extra_valid_fn`` lets callers AND in additional per-point validity
    (e.g. "any expert's occupancy" for the container path).

    ``report_budget > 0`` adds an ``overflow`` key: the fraction of valid
    candidates that ``march_rays_budget`` WOULD drop at that per-ray
    budget on this batch. It costs one reduction and lets the trainer's
    auto-regime controller measure, from the safe strided path, when the
    grids have sparsified enough for the faster global-budget path
    (observed this round: switching blind at warmup dropped 54-70% of
    valid samples batch-tail-first and sent eval PSNR falling).
    """
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    near = jnp.maximum(near, cfg.near_plane)
    far = jnp.minimum(far, cfg.far_plane)
    far = jnp.maximum(far, near)  # empty interval for invalid rays

    e = jnp.linspace(0.0, 1.0, s_max + 1, dtype=jnp.float32)[None, :]
    edges = near[:, None] * (1.0 - e) + far[:, None] * e  # (N, s_max+1)
    t0, t1 = edges[:, :-1], edges[:, 1:]

    if key is not None:
        k_jit, k_phase = jax.random.split(key)
        u = jax.random.uniform(k_jit, t0.shape, dtype=jnp.float32)
    else:
        k_phase = None
        u = 0.5
    t_s = t0 + u * (t1 - t0)
    x = o[:, None, :] + d[:, None, :] * t_s[..., None]  # (N, s_max, 3)

    valid = (t1 > t0) & occupancy_lookup(state, x)
    if extra_valid_fn is not None:
        valid = valid & extra_valid_fn(x)

    idx, mask, scale = compact_samples_strided(valid, s_kept, key=k_phase)
    t0k = jnp.take_along_axis(t0, idx, axis=1)
    t1k = jnp.take_along_axis(t1, idx, axis=1)
    xk = jnp.take_along_axis(x, idx[..., None], axis=1)
    dts = (t1k - t0k) * scale[:, None]

    out = {
        "t_starts": t0k,
        "t_ends": t1k,
        "dts": dts,
        "positions": xk,
        "mask": mask,
    }
    if report_budget > 0:
        n_valid = jnp.sum(valid)
        cap = jnp.int32(rays.shape[0] * int(report_budget))
        out["overflow"] = jnp.maximum(n_valid - cap, 0) / jnp.maximum(
            n_valid, 1
        )
    return out
