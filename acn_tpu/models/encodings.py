"""Input encodings: spherical harmonics, frequency (NeRF PE), and the
Instant-NGP multiresolution hash grid.

TPU-native counterpart of the reference's ``models/encodings.py``. The
reference pairs each encoder with a tiny-cuda-nn CUDA fast path and a
pure-torch fallback; here SH and frequency are plain ``jnp`` polynomials (XLA
fuses them into the surrounding MLP) and the hash grid has a pure-``jnp``
implementation (the correctness oracle, math identical to the reference torch
fallback at encodings.py:308-381) plus a Pallas TPU kernel in
``docs/hashgrid_kernel_memo.md`` for the hot path.

Everything here is functional: encoders are (config, params, x) → features.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# ============================ spherical harmonics ============================

MAX_SH_DEGREE = 4


def num_sh_bases(degree: int) -> int:
    assert degree <= MAX_SH_DEGREE, f"degree > {MAX_SH_DEGREE} unsupported"
    return (degree + 1) ** 2


def components_from_spherical_harmonics(degree: int, directions: Array) -> Array:
    """Real SH components up to ``degree`` for unit directions (..., 3).

    Same basis polynomials as the reference (encodings.py:27-81, which follow
    Nerfstudio). Returns (..., (degree+1)^2).
    """
    assert 0 <= degree <= MAX_SH_DEGREE
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z

    comps = [jnp.full(x.shape, 0.28209479177387814, directions.dtype)]
    if degree > 0:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if degree > 1:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if degree > 2:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    if degree > 3:
        comps += [
            2.5033429417967046 * x * y * (xx - yy),
            1.7701307697799304 * y * z * (3 * xx - yy),
            0.9461746957575601 * x * y * (7 * zz - 1),
            0.6690465435572892 * y * z * (7 * zz - 3),
            0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
            0.6690465435572892 * x * z * (7 * zz - 3),
            0.47308734787878004 * (xx - yy) * (7 * zz - 1),
            1.7701307697799304 * x * z * (xx - 3 * yy),
            0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


def sh_encode(d: Array, levels: int = 4) -> Array:
    """SH encoding of (possibly unnormalized) directions.

    ``levels`` SH levels ⇒ degree = levels − 1, out dim = levels².
    Normalizes inside (reference encodings.py:133-151).
    """
    if levels <= 0 or levels > MAX_SH_DEGREE + 1:
        raise ValueError(f"Supported levels ∈ [1, {MAX_SH_DEGREE + 1}], got {levels}")
    norm = jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    d = d / norm
    return components_from_spherical_harmonics(levels - 1, d)


def sh_out_dim(levels: int) -> int:
    return levels**2


# ============================ frequency encoding ============================


def frequency_encode(
    x: Array,
    pe_dim: int,
    include_input: bool = True,
    use_pi: bool = False,
) -> Array:
    """NeRF positional encoding (reference encodings.py:437-444):
    concat([x?], cos(2^k x), sin(2^k x)) over k < pe_dim, per input dim.

    Note the reference concatenates cos *before* sin per dim; kept identical.
    """
    bands = 2.0 ** jnp.arange(pe_dim, dtype=x.dtype)
    xin = x * (math.pi if use_pi else 1.0)
    x_exp = xin[..., None] * bands  # (..., D, L)
    pe = jnp.concatenate([jnp.cos(x_exp), jnp.sin(x_exp)], axis=-1)
    pe = pe.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, pe], axis=-1) if include_input else pe


def frequency_out_dim(in_dim: int, pe_dim: int, include_input: bool = True) -> int:
    return in_dim * (2 * pe_dim + (1 if include_input else 0))


# ============================ hash grid encoding ============================

# Instant-NGP 3D spatial hash primes (public constants; also used by the
# reference torch fallback, encodings.py:271-274). uint32 wraparound keeps the
# low log2_hashmap_size bits identical to the reference's int64 arithmetic.
HASH_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    """Hyperparameters mirroring the reference HashGridEncoder
    (encodings.py:180-215).

    ``layout`` selects the table memory layout:

    * ``corner`` — classic Instant-NGP: one (F,)-row per hashed corner,
      8 gathers per (point, level). Bit-compatible with the reference torch
      fallback; the correctness oracle.
    * ``cell`` — TPU-native: one (8·F,)-row per hashed **cell** holding all
      8 corner features. TPU gathers are row-count-bound (~220M rows/s
      regardless of width), so this cuts gather AND scatter-grad rows 8×.
      Corners are no longer shared between adjacent cells (the field may be
      discontinuous at cell faces, like hash collisions already make it);
      capacity per table entry is 8× higher at equal ``log2_hashmap_size``.
    """

    levels: int = 16
    min_res: int = 16
    max_res: int = 4096
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-3
    interpolation: str = "Linear"  # "Linear" | "Nearest" | "Smoothstep"
    # "auto"/"jnp": the XLA gather/scatter path — measured AT the HBM
    # transaction roofline for this access pattern; Mosaic has no vectorized
    # table-gather primitive to beat it with (docs/hashgrid_kernel_memo.md)
    backend: str = "auto"  # "auto" | "jnp"
    layout: str = "corner"  # "corner" | "cell"
    # Cell-layout backward strategy. "remat" recomputes the forward (indices
    # AND the row gather) in the backward pass — minimal residual memory.
    # "save_rows" keeps the gathered rows + intra-cell fractions as
    # residuals: the backward becomes scatter + elementwise only, removing
    # one full re-gather (~1/3 of the hash row traffic of a fwd+bwd) for
    # ~(8F+4)·bytes/point·level of residual memory.
    cell_backward: str = "save_rows"  # "save_rows" | "remat"
    # Clamp per-level cell-layout tables to res³ rows with LINEAR (dense)
    # indexing when that's smaller than 2^log2 — tcnn's behavior
    # (collision-free coarse levels, smaller scatter targets). Changes table
    # shapes, so it is opt-in for checkpoint compatibility.
    dense_levels: bool = False

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    def level_rows(self, l: int) -> int:
        """Cell-layout rows for level l (dense-clamped when enabled)."""
        if self.layout == "cell" and self.dense_levels:
            res = int(self.level_resolutions()[l])
            return min(self.table_size, res * res * res)
        return self.table_size

    @property
    def out_dim(self) -> int:
        return self.levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.levels <= 1:
            return 1.0
        return float(
            math.exp((math.log(self.max_res) - math.log(self.min_res)) / (self.levels - 1))
        )

    def level_resolutions(self) -> np.ndarray:
        """Per-level integer resolutions N_l = ⌊N_min · g^l⌋ (encodings.py:204-215)."""
        ls = np.arange(self.levels, dtype=np.float64)
        return np.floor(self.min_res * (self.growth_factor**ls)).astype(np.int32)


def init_hash_table(key: jax.Array, cfg: HashGridConfig):
    """Uniform(-s, s) tables, fp32 (reference encodings.py:264-268).

    * corner layout: one array (levels · table_size, F) — matches the
      reference's single ``nn.Parameter``.
    * cell layout: a **list of per-level arrays** (table_size, 8 · F). The
      split matters for performance, not just organization: XLA keeps a
      scatter accumulator in VMEM only when the target fits (~≤8 MB), and
      the hash-grad scatter runs 6–12× faster against small per-level
      tables than against one concatenated table.
    """
    if cfg.layout == "cell":
        keys = jax.random.split(key, cfg.levels)
        w = 8 * cfg.features_per_level
        return [
            jax.random.uniform(k, (cfg.level_rows(l), w), jnp.float32, -1.0, 1.0)
            * cfg.hash_init_scale
            for l, k in enumerate(keys)
        ]
    T = cfg.table_size * cfg.levels
    return (
        jax.random.uniform(key, (T, cfg.features_per_level), jnp.float32, -1.0, 1.0)
        * cfg.hash_init_scale
    )


def _spatial_hash(ixyz: Array, log2_size: int) -> Array:
    """3-prime XOR hash of integer coords → [0, 2^log2_size).

    ixyz: (..., 3) non-negative int32. Computed in uint32: the wraparound
    preserves the low ``log2_size`` bits of the reference's int64 math.
    """
    ix = ixyz[..., 0].astype(jnp.uint32)
    iy = ixyz[..., 1].astype(jnp.uint32)
    iz = ixyz[..., 2].astype(jnp.uint32)
    h = (
        ix * jnp.uint32(HASH_PRIMES[0])
        ^ iy * jnp.uint32(HASH_PRIMES[1])
        ^ iz * jnp.uint32(HASH_PRIMES[2])
    )
    return (h & jnp.uint32(2**log2_size - 1)).astype(jnp.int32)


def _hash_encode_jnp_impl(table: Array, x01: Array, cfg: HashGridConfig) -> Array:
    """Pure-jnp multiresolution hash encoding — the correctness oracle.

    x01: (..., 3) in [0, 1]. Returns (..., levels · F). Math is identical to
    the reference torch fallback (encodings.py:331-381): per level, scale by
    the level resolution, gather the 8 corner features by spatial hash, and
    tri-lerp (Linear), smoothstep the weights (Smoothstep) or round (Nearest).
    """
    L, F = cfg.levels, cfg.features_per_level
    res = jnp.asarray(cfg.level_resolutions(), x01.dtype)  # (L,)
    scaled = x01[..., None, :] * res[:, None]  # (..., L, 3)

    if cfg.interpolation == "Nearest":
        idx = jnp.round(scaled).astype(jnp.int32)
        h = _spatial_hash(idx, cfg.log2_hashmap_size)
        offs = jnp.arange(L, dtype=jnp.int32) * cfg.table_size
        feats = table[h + offs]
        return feats.reshape(*x01.shape[:-1], L * F)

    floor = jnp.floor(scaled)
    frac = scaled - floor
    floor_i = floor.astype(jnp.int32)

    if cfg.interpolation == "Smoothstep":
        frac = frac * frac * (3 - 2 * frac)

    offs = jnp.arange(L, dtype=jnp.int32) * cfg.table_size  # (L,)
    batch_shape = x01.shape[:-1]

    # Memory layout note: working in (..., L, F) keeps a 16×2 trailing tile
    # that TPU pads 8×; instead every corner is flattened to (..., L·F) (4×
    # less padding) and the trilerp is a *sequential* weighted accumulation
    # over the 8 corners — product weights Πᵃ(wᵃ or 1−wᵃ) are exactly the
    # trilinear weights, and only one corner tensor is live at a time.
    feats = jnp.zeros((*batch_shape, L * F), table.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = floor_i + jnp.array([dx, dy, dz], jnp.int32)
                h = _spatial_hash(c, cfg.log2_hashmap_size)  # (..., L)
                f = table[h + offs].reshape(*batch_shape, L * F)
                w = (
                    (frac[..., 0] if dx else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dy else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dz else 1.0 - frac[..., 2])
                )  # (..., L)
                w = jnp.repeat(w, F, axis=-1)  # (..., L·F), matches reshape
                feats = feats + f * w.astype(table.dtype)
    return feats


def hash_encode_jnp(table: Array, x01: Array, cfg: HashGridConfig) -> Array:
    """jnp hash encoding, rematerialized: the 8-corner gather intermediates
    have a 16-lane trailing dim that TPU tiling pads 8× — letting autodiff
    save them as residuals (e.g. across MAML inner scans) wastes GBs, so the
    backward recomputes from (table, x01) instead."""
    return jax.checkpoint(_hash_encode_jnp_impl, static_argnums=(2,))(
        table, x01, cfg
    )


def _hash_encode_cell_impl(tables, x01: Array, cfg: HashGridConfig) -> Array:
    """Cell-packed hash encoding: ONE gathered row per (point, level).

    Row r = hash(cell) holds the cell's 8 corner features [c000…c111]
    (corner index c = 4·dx + 2·dy + dz), trilinearly blended with the
    intra-cell fraction. 8× fewer gather/scatter rows than the corner layout
    — the difference between the reference's CUDA hash kernels (shared-mem
    random access is free on GPUs) and the TPU memory system (row-count-bound
    gathers) demands the layout change, not a literal port.

    ``tables`` is the per-level list from ``init_hash_table`` (small scatter
    targets ⇒ VMEM-resident grad accumulation, see there).
    """
    L, F = cfg.levels, cfg.features_per_level
    resolutions = cfg.level_resolutions()

    feats = []
    for l in range(L):  # static unroll; one gather + blend per level
        scaled = x01 * jnp.asarray(resolutions[l], x01.dtype)  # (..., 3)
        cell = jnp.floor(scaled)
        frac = scaled - cell
        if cfg.interpolation == "Smoothstep":
            frac = frac * frac * (3 - 2 * frac)
        elif cfg.interpolation == "Nearest":
            frac = jnp.round(frac)

        cell_i = cell.astype(jnp.int32)
        res_l = int(resolutions[l])
        if cfg.dense_levels and res_l**3 <= cfg.level_rows(l):
            # dense level: collision-free linear index (tcnn semantics)
            ci = jnp.clip(cell_i, 0, res_l - 1)
            h = (ci[..., 0] * res_l + ci[..., 1]) * res_l + ci[..., 2]
        else:
            h = _spatial_hash(cell_i, cfg.log2_hashmap_size)
        rows = tables[l][h]  # (..., 8·F)

        wx = frac[..., 0:1]
        wy = frac[..., 1:2]
        wz = frac[..., 2:3]
        one = jnp.ones_like(wx)
        # corner weights in packing order (dz fastest): Π (w or 1−w)
        w = jnp.concatenate(
            [
                (wx if dx else one - wx) * (wy if dy else one - wy)
                * (wz if dz else one - wz)
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=-1,
        )  # (..., 8)
        w_rep = jnp.repeat(w, F, axis=-1).astype(rows.dtype)  # (..., 8F)
        weighted = rows * w_rep
        feats.append(
            weighted.reshape(*weighted.shape[:-1], 8, F).sum(axis=-2)
        )  # (..., F)
    return jnp.concatenate(feats, axis=-1)  # (..., L·F)


def _cell_level_lookup(tables, x01, cfg, l):
    """Per-level (rows (..., 8F), h (...,), frac_raw (..., 3))."""
    resolutions = cfg.level_resolutions()
    scaled = x01 * jnp.asarray(resolutions[l], x01.dtype)
    cell = jnp.floor(scaled)
    frac = scaled - cell
    cell_i = cell.astype(jnp.int32)
    res_l = int(resolutions[l])
    if cfg.dense_levels and res_l**3 <= cfg.level_rows(l):
        ci = jnp.clip(cell_i, 0, res_l - 1)
        h = (ci[..., 0] * res_l + ci[..., 1]) * res_l + ci[..., 2]
    else:
        h = _spatial_hash(cell_i, cfg.log2_hashmap_size)
    return tables[l][h], h, frac


def _corner_weights(frac):
    """(..., 8) trilinear corner weights in packing order (dz fastest)."""
    wx, wy, wz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    one = jnp.ones_like(wx)
    return jnp.concatenate(
        [
            (wx if dx else one - wx) * (wy if dy else one - wy)
            * (wz if dz else one - wz)
            for dx in (0, 1)
            for dy in (0, 1)
            for dz in (0, 1)
        ],
        axis=-1,
    )


def _interp_frac(frac, interpolation):
    if interpolation == "Smoothstep":
        return frac * frac * (3 - 2 * frac)
    if interpolation == "Nearest":
        return jnp.round(frac)
    return frac


def _cell_saved_fwd_impl(tables, x01, cfg: HashGridConfig):
    F = cfg.features_per_level
    feats, res_rows, res_h, res_frac = [], [], [], []
    for l in range(cfg.levels):
        rows, h, frac_raw = _cell_level_lookup(tables, x01, cfg, l)
        f = _interp_frac(frac_raw, cfg.interpolation)
        w = _corner_weights(f)  # (..., 8)
        out = jnp.einsum(
            "...c,...cf->...f", w.astype(rows.dtype),
            rows.reshape(*rows.shape[:-1], 8, F),
        )
        feats.append(out)
        res_rows.append(rows)
        res_h.append(h)
        res_frac.append(frac_raw)
    return jnp.concatenate(feats, axis=-1), (res_rows, res_h, res_frac)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hash_encode_cell_saved(tables, x01, cfg, nrows):
    return _cell_saved_fwd_impl(tables, x01, cfg)[0]


def _saved_fwd(tables, x01, cfg, nrows):
    out, (rows_l, h_l, frac_l) = _cell_saved_fwd_impl(tables, x01, cfg)
    return out, (rows_l, h_l, frac_l, x01)


def _saved_bwd(cfg, nrows, res, g):
    rows_l, h_l, frac_l, x01 = res
    F = cfg.features_per_level
    resolutions = cfg.level_resolutions()
    # corner sign pattern per axis (packing order: dz fastest)
    signs = np.array(
        [[1.0 if dx else -1.0, 1.0 if dy else -1.0, 1.0 if dz else -1.0]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        np.float32,
    )  # (8, 3)

    tab_grads = []
    gx = jnp.zeros(x01.shape, jnp.float32)
    for l in range(cfg.levels):
        rows, h, frac_raw = rows_l[l], h_l[l], frac_l[l]
        g_l = g[..., l * F:(l + 1) * F]  # (..., F)
        f = _interp_frac(frac_raw, cfg.interpolation)
        w = _corner_weights(f)  # (..., 8)

        # table grad: scatter w ⊗ g at h — scatter + elementwise ONLY, no
        # re-gather (the point of this backward)
        gw = (
            w[..., :, None].astype(g_l.dtype) * g_l[..., None, :]
        ).reshape(*w.shape[:-1], 8 * F)
        # cotangent shape comes from the OPERAND (nrows, static at trace
        # time), never cfg.level_rows: a restored checkpoint's ladder is
        # authoritative over whatever config the caller reconstructed
        tab_grads.append(
            jnp.zeros((nrows[l], 8 * F), rows.dtype)
            .at[h].add(gw.astype(rows.dtype))
        )

        # x grad via dw/df: for axis a, dw_c/df_a = sign_a(c)·Π_{b≠a} A_b
        rg = jnp.einsum(
            "...cf,...f->...c", rows.reshape(*rows.shape[:-1], 8, F),
            g_l.astype(rows.dtype),
        ).astype(jnp.float32)  # (..., 8)
        A = jnp.stack(
            [jnp.where(signs[None, :, a] > 0, f[..., None, a],
                       1.0 - f[..., None, a]).astype(jnp.float32)
             for a in range(3)],
            axis=-1,
        )  # (..., 8, 3) — per-axis factor per corner
        s = []
        for a in range(3):
            b1, b2 = [b for b in range(3) if b != a]
            others = A[..., b1] * A[..., b2]  # Π_{b≠a}
            s.append(jnp.sum(signs[None, :, a] * others * rg, axis=-1))
        s = jnp.stack(s, axis=-1)  # (..., 3) = dout/df
        if cfg.interpolation == "Smoothstep":
            chain = (6.0 * frac_raw * (1.0 - frac_raw)).astype(jnp.float32)
        else:
            chain = 1.0
        gx = gx + s * chain * jnp.float32(resolutions[l])
    return tab_grads, gx.astype(x01.dtype)


_hash_encode_cell_saved.defvjp(_saved_fwd, _saved_bwd)


def hash_encode_cell(table: Array, x01: Array, cfg: HashGridConfig) -> Array:
    """Cell-packed encoding.

    Backward per ``cfg.cell_backward``: "save_rows" keeps the gathered rows
    as residuals (backward = scatter + elementwise, no re-gather); "remat"
    recomputes the forward in the backward pass (minimal memory)."""
    got = tuple(int(t.shape[0]) for t in table)
    want = tuple(cfg.level_rows(l) for l in range(cfg.levels))
    if got != want:
        raise ValueError(
            "hash table rows do not match the config ladder (config "
            f"expects {want}, tables have {got}) — usually a checkpoint "
            "restored under a config whose log2_hashmap_size/max_res/"
            "hash_dense_levels differ from the one it was trained with"
        )
    if cfg.cell_backward == "save_rows" and cfg.interpolation != "Nearest":
        return _hash_encode_cell_saved(
            table, x01, cfg, tuple(int(t.shape[0]) for t in table)
        )
    return jax.checkpoint(_hash_encode_cell_impl, static_argnums=(2,))(
        table, x01, cfg
    )


def hash_encode(table: Array, x01: Array, cfg: HashGridConfig) -> Array:
    """Dispatch on layout/backend."""
    if cfg.layout == "cell":
        return hash_encode_cell(table, x01, cfg)
    backend = cfg.backend
    if backend in ("auto", "jnp"):
        return hash_encode_jnp(table, x01, cfg)
    raise ValueError(f"Unknown hash backend {backend!r}")
