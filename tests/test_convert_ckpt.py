"""Reference-checkpoint converter: round-trip forward parity."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.models.encodings import HashGridConfig
from acn_tpu.models.ngp import NGPConfig
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.scripts.convert_reference_ckpt import (
    reference_state_dict_to_variables,
)


def _setup(K=2):
    cfg = ContainerConfig(
        num_submodules=K,
        boundary_margin=1.1,
        cluster_2d=True,
        use_bg_nerf=True,
        bg_hidden=8,
        expert=NGPConfig(
            hidden=16, color_hidden=16, sigma_depth=2, color_depth=2,
            hash=HashGridConfig(levels=2, min_res=4, max_res=8,
                                log2_hashmap_size=6, layout="corner"),
        ),
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]])[:K]
    boxes = jnp.stack([sbox.make_aabb([-1, -1, -1], [1, 1, 1])] * K)
    gaabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    variables = cont.init_container(jax.random.PRNGKey(0), cfg, cents, boxes, gaabb)
    return cfg, variables


def _to_reference_sd(variables, cfg):
    """Inverse mapping: our pytree → reference-style torch state dict."""
    sd = {}
    K = cfg.num_submodules
    experts = variables["params"]["experts"]
    for k in range(K):
        e = jax.tree.map(lambda a: np.asarray(a[k]), experts)
        p = f"submodules.{k}."
        sd[p + "xyz_encoder.hash_table"] = torch.tensor(e["hash_table"])
        for i, lin in enumerate(e["sigma_trunk"]):
            sd[p + f"sigma_trunk.{i}.linear.weight"] = torch.tensor(lin["w"].T)
            sd[p + f"sigma_trunk.{i}.linear.bias"] = torch.tensor(lin["b"])
        for name in ("sigma_head", "geo_head"):
            sd[p + f"{name}.weight"] = torch.tensor(e[name]["w"].T)
            sd[p + f"{name}.bias"] = torch.tensor(e[name]["b"])
        n = len(e["color_mlp"])
        for i, lin in enumerate(e["color_mlp"][:-1]):
            sd[p + f"color_mlp.{i}.linear.weight"] = torch.tensor(lin["w"].T)
            sd[p + f"color_mlp.{i}.linear.bias"] = torch.tensor(lin["b"])
        last = e["color_mlp"][-1]
        sd[p + f"color_mlp.{n - 1}.weight"] = torch.tensor(last["w"].T)
        sd[p + f"color_mlp.{n - 1}.bias"] = torch.tensor(last["b"])
    bg = variables["params"]["bg_mlp"]
    sd["bg_mlp.0.weight"] = torch.tensor(np.asarray(bg[0]["w"]).T)
    sd["bg_mlp.0.bias"] = torch.tensor(np.asarray(bg[0]["b"]))
    sd["bg_mlp.2.weight"] = torch.tensor(np.asarray(bg[1]["w"]).T)
    sd["bg_mlp.2.bias"] = torch.tensor(np.asarray(bg[1]["b"]))
    sd["centroids"] = torch.tensor(np.asarray(variables["buffers"]["centroids"]))
    return sd


def test_converter_roundtrip_forward_parity():
    cfg, variables = _setup()
    sd = _to_reference_sd(variables, cfg)

    # fresh template with different params — conversion must overwrite them
    # (buffers — AABBs — legitimately come from the template/dataset)
    _, template = _setup()
    template = {
        "params": jax.tree.map(
            lambda a: a + 0.1 if jnp.issubdtype(a.dtype, jnp.floating) else a,
            template["params"],
        ),
        "buffers": template["buffers"],
    }
    restored = reference_state_dict_to_variables(sd, cfg, template)
    restored = jax.tree.map(jnp.asarray, restored)

    x = jax.random.normal(jax.random.PRNGKey(1), (256, 6))
    y0 = cont.container_forward(variables, cfg, x)
    y1 = cont.container_forward(restored, cfg, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    b0 = cont.background_color(variables, cfg, d)
    b1 = cont.background_color(restored, cfg, d)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=1e-6)
