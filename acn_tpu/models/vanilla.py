"""Classical (vanilla) NeRF expert as pure functions over a params pytree.

TPU-native counterpart of the reference's ``models/inr/meta_vanilla.py``
MetaNeRF: Fourier xyz PE, trunk with NeRF-style skip connections, σ/geo head
split, and a view-dependent color MLP. The reference's "spherical" dir path is
broken there (``SHEncoder(degree=4)`` kwarg bug, meta_vanilla.py:58); here it
simply works.

Unlike the reference (whose forward takes (x, d) and returns a dict), the
expert exposes the same ``(…, 6) → (…, 4)`` packed interface as the NGP
expert so renderers and the container treat variants uniformly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp

from acn_tpu.models import nn
from acn_tpu.models.encodings import (
    frequency_encode,
    frequency_out_dim,
    sh_encode,
    sh_out_dim,
)
from acn_tpu.models.trunc_exp import trunc_exp

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclass(frozen=True)
class VanillaConfig:
    """Defaults match the reference MetaNeRF (meta_vanilla.py:19-35)."""

    hidden: int = 256
    sigma_depth: int = 8
    skips: Tuple[int, ...] = (4,)
    geo_feat_dim: int = 15
    color_hidden: int = 128
    color_depth: int = 2
    use_sigmoid_rgb: bool = True
    pe_dim_xyz: int = 10
    include_input_xyz: bool = True
    dir_encoding: str = "spherical"  # "spherical" | "frequency"
    sh_levels: int = 4
    freq_pe_dim_dir: int = 4

    @property
    def xyz_enc_dim(self) -> int:
        return frequency_out_dim(3, self.pe_dim_xyz, self.include_input_xyz)

    @property
    def dir_enc_dim(self) -> int:
        if self.dir_encoding == "spherical":
            return sh_out_dim(self.sh_levels)
        return frequency_out_dim(3, self.freq_pe_dim_dir, include_input=True)


def init_vanilla(key: jax.Array, cfg: VanillaConfig, dtype=jnp.float32) -> Params:
    k_trunk, k_sh, k_gh, k_color = jax.random.split(key, 4)

    in_xyz = cfg.xyz_enc_dim
    trunk = []
    tkeys = jax.random.split(k_trunk, max(cfg.sigma_depth, 1))
    for i in range(cfg.sigma_depth):
        in_dim = in_xyz if i == 0 else cfg.hidden
        if i in cfg.skips and i != 0:
            in_dim = cfg.hidden + in_xyz
        trunk.append(nn.init_linear(tkeys[i], in_dim, cfg.hidden, dtype=dtype))

    sigma_head = nn.init_linear(k_sh, cfg.hidden, 1, dtype=dtype)
    geo_head = nn.init_linear(k_gh, cfg.hidden, cfg.geo_feat_dim, dtype=dtype)

    color_dims = (
        [cfg.geo_feat_dim + cfg.dir_enc_dim]
        + [cfg.color_hidden] * max(cfg.color_depth - 1, 0)
        + [3]
    )
    color_mlp = nn.init_mlp(k_color, color_dims, dtype=dtype)

    return {
        "trunk": trunk,
        "sigma_head": sigma_head,
        "geo_head": geo_head,
        "color_mlp": color_mlp,
    }


def _enc_dir(cfg: VanillaConfig, d: Array) -> Array:
    norm = jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    d = d / norm
    if cfg.dir_encoding == "spherical":
        return sh_encode(d, cfg.sh_levels)
    return frequency_encode(d, cfg.freq_pe_dim_dir, include_input=True, use_pi=False)


def vanilla_density(
    params: Params,
    cfg: VanillaConfig,
    aabb: Array,  # (2, 3) — unused (PE is global); kept for expert-API parity
    x: Array,  # (..., 3)
    return_feats: bool = False,
) -> Union[Array, Dict[str, Array]]:
    """xyz → trunk with skips → σ (trunc_exp) / geo features
    (reference meta_vanilla.py:123-141)."""
    enc = frequency_encode(
        x, cfg.pe_dim_xyz, include_input=cfg.include_input_xyz, use_pi=False
    ).astype(x.dtype)
    h = enc
    for i, layer in enumerate(params["trunk"]):
        if i in cfg.skips and i != 0:
            h = jnp.concatenate([h, enc], axis=-1)
        h = jax.nn.relu(nn.apply_linear(layer, h))

    sigma = trunc_exp(nn.apply_linear(params["sigma_head"], h))
    if not return_feats:
        return sigma
    geo_feat = nn.apply_linear(params["geo_head"], h)
    return {"sigma": sigma, "geo_feat": geo_feat}


def vanilla_color(
    params: Params, cfg: VanillaConfig, d: Array, geo_feat: Array
) -> Array:
    d_enc = _enc_dir(cfg, d).astype(geo_feat.dtype)
    h = jnp.concatenate([geo_feat, d_enc], axis=-1)
    rgb = nn.apply_mlp(params["color_mlp"], h, activation="relu")
    return jax.nn.sigmoid(rgb) if cfg.use_sigmoid_rgb else rgb


def vanilla_forward(
    params: Params,
    cfg: VanillaConfig,
    aabb: Array,
    x_d: Array,  # (..., 6) [xyz, dir]
) -> Array:
    x, d = x_d[..., :3], x_d[..., 3:6]
    out = vanilla_density(params, cfg, aabb, x, return_feats=True)
    rgb = vanilla_color(params, cfg, d, out["geo_feat"])
    return jnp.concatenate([rgb, out["sigma"]], axis=-1)


def param_group_labels(params: Params) -> Params:
    """Optimizer group labels; the vanilla expert has no separate hash
    encoding, so the trunk doubles as both 'sigma' group members."""
    return {
        "trunk": jax.tree.map(lambda _: "sigma", params["trunk"]),
        "sigma_head": jax.tree.map(lambda _: "sigma", params["sigma_head"]),
        "geo_head": jax.tree.map(lambda _: "sigma", params["geo_head"]),
        "color_mlp": jax.tree.map(lambda _: "color", params["color_mlp"]),
    }
