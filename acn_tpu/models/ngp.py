"""Instant-NGP-style NeRF expert as pure functions over a params pytree.

TPU-native counterpart of the reference's ``models/inr/meta_ngp.py`` MetaNGP
(meta_ngp.py:15-241): hash-encoded σ-trunk → {σ head (bias −1, trunc_exp),
geo-feature head} and a color MLP over [geo_feat, dir_enc] with sigmoid RGB.
World coords are normalized into the expert's own AABB and clamped to
[eps, 1−eps] before hash encoding (meta_ngp.py:155-163).

The occupancy subsystem lives in ``acn_tpu.occupancy`` (it's per-expert state,
not parameters). The expert AABB is an *array argument*, not config, so K
experts can be stacked and vmapped with per-expert boxes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from acn_tpu.models import nn
from acn_tpu.models.encodings import (
    HashGridConfig,
    frequency_encode,
    frequency_out_dim,
    hash_encode,
    init_hash_table,
    sh_encode,
    sh_out_dim,
)
from acn_tpu.models.trunc_exp import trunc_exp

Array = jnp.ndarray
Params = Dict[str, Any]

ENC_EPS = 1e-6  # hash-input clamp (reference meta_ngp.py:38-39, 155-158)


@dataclass(frozen=True)
class NGPConfig:
    """Architecture hyperparameters (reference meta_ngp.py:21-35 defaults,
    overridden by the runner from args at nerf_runner.py:102-169)."""

    hidden: int = 64
    sigma_depth: int = 2
    color_hidden: int = 64
    color_depth: int = 3
    geo_feat_dim: int = 15
    use_sigmoid_rgb: bool = True
    dir_encoding: str = "spherical"  # "spherical" | "frequency"
    sh_levels: int = 4
    freq_pe_dim: int = 4
    hash: HashGridConfig = field(default_factory=HashGridConfig)

    @property
    def dir_enc_dim(self) -> int:
        if self.dir_encoding == "spherical":
            return sh_out_dim(self.sh_levels)
        if self.dir_encoding == "frequency":
            return frequency_out_dim(3, self.freq_pe_dim, include_input=True)
        raise ValueError(f"Unsupported dir_encoding: {self.dir_encoding}")


def init_ngp(key: jax.Array, cfg: NGPConfig, dtype=jnp.float32) -> Params:
    """Initialize one expert's parameter pytree."""
    k_hash, k_trunk, k_sh, k_gh, k_color = jax.random.split(key, 5)

    in_xyz = cfg.hash.out_dim
    trunk_dims = [in_xyz] + [cfg.hidden] * max(cfg.sigma_depth, 0)
    sigma_trunk = nn.init_mlp(k_trunk, trunk_dims, dtype=dtype)
    last = trunk_dims[-1]

    sigma_head = nn.init_linear(k_sh, last, 1, dtype=dtype)
    # density bias init −1.0 (reference meta_ngp.py:82-85)
    sigma_head["b"] = jnp.full_like(sigma_head["b"], -1.0)

    geo_head = nn.init_linear(k_gh, last, cfg.geo_feat_dim, dtype=dtype)

    color_dims = (
        [cfg.geo_feat_dim + cfg.dir_enc_dim]
        + [cfg.color_hidden] * max(cfg.color_depth, 0)
        + [3]
    )
    color_mlp = nn.init_mlp(k_color, color_dims, dtype=dtype)

    return {
        "hash_table": init_hash_table(k_hash, cfg.hash),
        "sigma_trunk": sigma_trunk,
        "sigma_head": sigma_head,
        "geo_head": geo_head,
        "color_mlp": color_mlp,
    }


def world_to_unit(x: Array, aabb: Array) -> Array:
    """World → clamped [0,1]^3 inside the expert AABB
    (reference meta_ngp.py:155-158). Follows x's dtype (bf16 under AMP)."""
    aabb = aabb.astype(x.dtype)
    x01 = (x - aabb[0]) / (aabb[1] - aabb[0])
    return jnp.clip(x01, ENC_EPS, 1.0 - ENC_EPS)


def _enc_dir(cfg: NGPConfig, d: Array) -> Array:
    norm = jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    d = d / norm
    if cfg.dir_encoding == "spherical":
        return sh_encode(d, cfg.sh_levels)
    return frequency_encode(d, cfg.freq_pe_dim, include_input=True, use_pi=False)


def ngp_density(
    params: Params,
    cfg: NGPConfig,
    aabb: Array,  # (2, 3)
    x: Array,  # (..., 3) world coords
    return_feats: bool = False,
) -> Union[Array, Dict[str, Array]]:
    """σ (and optionally geo features) at world coords
    (reference meta_ngp.py:192-224)."""
    x01 = world_to_unit(x, aabb)
    h = hash_encode(params["hash_table"], x01, cfg.hash).astype(x.dtype)
    h = nn.apply_mlp(params["sigma_trunk"], h, activation="relu",
                     final_activation="relu")
    sigma_raw = nn.apply_linear(params["sigma_head"], h)
    sigma = trunc_exp(sigma_raw)
    if not return_feats:
        return sigma
    geo_feat = nn.apply_linear(params["geo_head"], h)
    return {"sigma": sigma, "geo_feat": geo_feat}


def ngp_color(
    params: Params,
    cfg: NGPConfig,
    d: Array,  # (..., 3) view directions
    geo_feat: Array,  # (..., G)
) -> Array:
    """View-dependent RGB (reference meta_ngp.py:171-190)."""
    d_enc = _enc_dir(cfg, d).astype(geo_feat.dtype)
    h = jnp.concatenate([geo_feat, d_enc], axis=-1)
    rgb = nn.apply_mlp(params["color_mlp"], h, activation="relu")
    return jax.nn.sigmoid(rgb) if cfg.use_sigmoid_rgb else rgb


def ngp_forward(
    params: Params,
    cfg: NGPConfig,
    aabb: Array,  # (2, 3)
    x_d: Array,  # (..., 6) [xyz, dir]
) -> Array:
    """(..., 6) [xyz, dir] → (..., 4) [rgb, σ] (reference meta_ngp.py:226-241)."""
    x, d = x_d[..., :3], x_d[..., 3:6]
    out = ngp_density(params, cfg, aabb, x, return_feats=True)
    rgb = ngp_color(params, cfg, d, out["geo_feat"])
    return jnp.concatenate([rgb, out["sigma"]], axis=-1)


def param_group_labels(params: Params) -> Params:
    """Label every leaf with its optimizer group — {encoding, sigma, color} —
    mirroring MetaNGP.get_param_groups (reference meta_ngp.py:446-469).
    Used by optax.multi_transform for per-group learning rates."""
    return {
        "hash_table": jax.tree.map(lambda _: "encoding", params["hash_table"]),
        "sigma_trunk": jax.tree.map(lambda _: "sigma", params["sigma_trunk"]),
        "sigma_head": jax.tree.map(lambda _: "sigma", params["sigma_head"]),
        "geo_head": jax.tree.map(lambda _: "sigma", params["geo_head"]),
        "color_mlp": jax.tree.map(lambda _: "color", params["color_mlp"]),
    }
