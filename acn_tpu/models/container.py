"""Mixture-of-experts NeRF container: routing, stacked experts, background.

TPU-native counterpart of the reference's ``models/inr/meta_container.py``
MetaContainer (meta_container.py:21-503). Key redesign:

* the K experts are **stacked** — one pytree whose leaves carry a leading K
  axis — instead of an ``nn.ModuleList``; all-expert evaluation is a ``vmap``
  (shardable over a mesh ``expert`` axis), not a Python loop;
* routing returns a **dense (N, K) weight matrix** (hard assignment = one-hot)
  and blending is a single einsum — no ``index_add_``/``index_copy_``
  scatter-gather, which is exactly what TPUs dislike;
* buffers (centroids, per-expert AABBs, global AABB) live beside trainable
  params in a ``variables = {"params", "buffers"}`` dict so optimizers see
  only params while checkpoints capture everything.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp

from acn_tpu.models import ngp as ngp_mod
from acn_tpu.models import nn
from acn_tpu.models import vanilla as van_mod
from acn_tpu.models.encodings import (
    frequency_encode,
    frequency_out_dim,
    sh_encode,
    sh_out_dim,
)
from acn_tpu.models.ngp import NGPConfig
from acn_tpu.models.vanilla import VanillaConfig

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclass(frozen=True)
class ContainerConfig:
    """Mirrors MetaContainer's constructor surface
    (reference meta_container.py:30-44)."""

    num_submodules: int = 4
    nerf_variant: str = "instant"  # "instant" | "vanilla"
    boundary_margin: float = 1.0
    cluster_2d: bool = True
    use_bg_nerf: bool = True
    bg_hidden: int = 32
    bg_encoding: str = "spherical"  # "spherical" | "frequency"
    bg_sh_levels: int = 4
    bg_freq_pe_dim: int = 4
    expert: Union[NGPConfig, VanillaConfig] = field(default_factory=NGPConfig)

    @property
    def bg_enc_dim(self) -> int:
        if self.bg_encoding == "spherical":
            return sh_out_dim(self.bg_sh_levels)
        return frequency_out_dim(3, self.bg_freq_pe_dim, include_input=True)

    @property
    def expert_forward(self):
        return (
            ngp_mod.ngp_forward
            if self.nerf_variant == "instant"
            else van_mod.vanilla_forward
        )

    @property
    def expert_density(self):
        return (
            ngp_mod.ngp_density
            if self.nerf_variant == "instant"
            else van_mod.vanilla_density
        )

    @property
    def expert_color(self):
        return (
            ngp_mod.ngp_color if self.nerf_variant == "instant" else van_mod.vanilla_color
        )

    @property
    def expert_init(self):
        return ngp_mod.init_ngp if self.nerf_variant == "instant" else van_mod.init_vanilla

    @property
    def expert_group_labels(self):
        return (
            ngp_mod.param_group_labels
            if self.nerf_variant == "instant"
            else van_mod.param_group_labels
        )


def init_container(
    key: jax.Array,
    cfg: ContainerConfig,
    centroids: Array,  # (K, 3) in world DRB
    expert_aabbs: Array,  # (K, 2, 3)
    global_aabb: Array,  # (2, 3)
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Build the full variable tree: stacked expert params + bg head + buffers."""
    K = cfg.num_submodules
    assert centroids.shape == (K, 3), centroids.shape
    assert expert_aabbs.shape == (K, 2, 3), expert_aabbs.shape

    k_experts, k_bg = jax.random.split(key)
    expert_keys = jax.random.split(k_experts, K)
    experts = jax.vmap(lambda k: cfg.expert_init(k, cfg.expert, dtype=dtype))(
        expert_keys
    )

    params: Params = {"experts": experts}
    if cfg.use_bg_nerf:
        params["bg_mlp"] = nn.init_mlp(
            k_bg, [cfg.bg_enc_dim, cfg.bg_hidden, 3], dtype=dtype
        )

    buffers = {
        "centroids": jnp.asarray(centroids, jnp.float32),
        "expert_aabbs": jnp.asarray(expert_aabbs, jnp.float32),
        "global_aabb": jnp.asarray(global_aabb, jnp.float32),
    }
    return {"params": params, "buffers": buffers}


# ============================ routing ============================


def routing_weights(
    centroids: Array,  # (K, 3)
    pts: Array,  # (N, 3) world DRB
    cluster_2d: bool = True,
    boundary_margin: float = 1.0,
) -> Array:
    """Per-point expert weights (N, K), dense.

    Matches MetaContainer._routing (reference meta_container.py:97-134):
    distances in the clustering subspace (YZ when cluster_2d); soft
    inverse-distance weights masked to experts within margin·min-dist when
    boundary_margin > 1, else a hard one-hot of the argmin.
    """
    idx = (1, 2) if cluster_2d else (0, 1, 2)
    x = pts[:, idx]  # (N, d)
    c = centroids[:, idx]  # (K, d)
    d2 = jnp.sum((x[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))

    if boundary_margin > 1.0:
        dist = jnp.maximum(dist, 1e-6)
        invd = 1.0 / dist
        mind = jnp.min(dist, axis=1, keepdims=True)
        mask = dist <= boundary_margin * mind
        invd = invd * mask
        denom = jnp.maximum(jnp.sum(invd, axis=1, keepdims=True), 1e-6)
        return invd / denom

    hard = jnp.argmin(dist, axis=1)
    return jax.nn.one_hot(hard, centroids.shape[0], dtype=pts.dtype)


# ============================ expert access ============================


def expert_slice(experts: Params, k) -> Params:
    """Select expert ``k`` from the stacked pytree (k may be traced)."""
    return jax.tree.map(lambda a: a[k], experts)


def num_experts(variables: Dict[str, Any]) -> int:
    return int(variables["buffers"]["centroids"].shape[0])


# ============================ network calls ============================


def container_forward(
    variables: Dict[str, Any],
    cfg: ContainerConfig,
    x: Array,  # (N, D>=6) [xyz, dir, ...]
    active_module: Optional[int] = None,
    params_override: Optional[Params] = None,
) -> Array:
    """Routed forward (reference meta_container.py:275-343).

    * ``active_module`` set → run only that expert on everything (the
      per-region training path).
    * else → evaluate all K experts (vmap) and blend with dense routing
      weights: ``y_mix = Σ_k w_k · y_k`` — identical semantics to the
      reference's soft path, and its hard path via one-hot weights.

    ``params_override`` substitutes fast weights for the expert subtree
    (stacked (K, ...) when active_module is None, single-expert otherwise).
    """
    experts = (
        params_override
        if params_override is not None
        else variables["params"]["experts"]
    )
    bufs = variables["buffers"]
    aabbs = bufs["expert_aabbs"]
    fwd = cfg.expert_forward

    if active_module is not None:
        p_k = expert_slice(experts, active_module)
        return fwd(p_k, cfg.expert, aabbs[active_module], x[..., :6])

    ys = jax.vmap(lambda p, ab: fwd(p, cfg.expert, ab, x[..., :6]))(
        experts, aabbs
    )  # (K, N, 4)
    w = routing_weights(
        bufs["centroids"], x[..., :3], cfg.cluster_2d, cfg.boundary_margin
    ).astype(ys.dtype)
    return jnp.einsum("nk,kno->no", w, ys)


def container_density(
    variables: Dict[str, Any],
    cfg: ContainerConfig,
    xyz: Array,  # (N, 3)
    active_module: Optional[int] = None,
    params_override: Optional[Params] = None,
) -> Array:
    """Routed density query → σ (N,) (reference meta_container.py:217-273)."""
    experts = (
        params_override
        if params_override is not None
        else variables["params"]["experts"]
    )
    bufs = variables["buffers"]
    aabbs = bufs["expert_aabbs"]
    dens = cfg.expert_density

    if active_module is not None:
        p_k = expert_slice(experts, active_module)
        return dens(p_k, cfg.expert, aabbs[active_module], xyz)[..., 0]

    sig = jax.vmap(lambda p, ab: dens(p, cfg.expert, ab, xyz)[..., 0])(
        experts, aabbs
    )  # (K, N)
    w = routing_weights(
        bufs["centroids"], xyz, cfg.cluster_2d, cfg.boundary_margin
    ).astype(sig.dtype)
    return jnp.einsum("nk,kn->n", w, sig)


def background_color(
    variables: Dict[str, Any], cfg: ContainerConfig, d: Array
) -> Array:
    """Background RGB from ray directions via the SH/frequency-encoded 2-layer
    sigmoid MLP (reference meta_container.py:76-93, 347-382)."""
    if not cfg.use_bg_nerf:
        raise RuntimeError("background_color called but use_bg_nerf=False")
    norm = jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    dn = d / norm
    if cfg.bg_encoding == "spherical":
        enc = sh_encode(dn, cfg.bg_sh_levels)
    else:
        enc = frequency_encode(dn, cfg.bg_freq_pe_dim, include_input=True)
    h = nn.apply_linear(variables["params"]["bg_mlp"][0], enc.astype(jnp.float32))
    h = jax.nn.relu(h)
    rgb = nn.apply_linear(variables["params"]["bg_mlp"][1], h)
    return jax.nn.sigmoid(rgb)


def param_group_labels(variables: Dict[str, Any], cfg: ContainerConfig) -> Params:
    """Optimizer-group labels for the whole container
    ({encoding, sigma, color, background}; reference meta_container.py:458-503)."""
    experts = variables["params"]["experts"]
    one = cfg.expert_group_labels(jax.tree.map(lambda a: a[0], experts))
    # broadcast labels back over the stacked axis (labels are per-leaf strings)
    labels: Params = {"experts": one}
    if cfg.use_bg_nerf and "bg_mlp" in variables["params"]:
        labels["bg_mlp"] = jax.tree.map(
            lambda _: "background", variables["params"]["bg_mlp"]
        )
    return labels
