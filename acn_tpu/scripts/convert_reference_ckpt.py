"""Convert a reference (psklavos1/adaptive-city-nerf) torch checkpoint into
this framework's msgpack checkpoint format.

The reference releases a 4-expert checkpoint (reference README.md:196,
``v1.0/4_experts.zip``) whose ``{tag}.model`` is a torch ``state_dict`` of
``MetaContainer`` (reference utils.py:262-302). This tool maps it onto our
functional pytree so a true PSNR-parity comparison can run on TPU.

Key mapping (reference module tree → our pytree):

    submodules.{k}.xyz_encoder.hash_table        → experts.hash_table (corner layout)
    submodules.{k}.xyz_encoder._tcnn_enc.params  → (tcnn blob; de-interleaved
                                                    per-level, see below)
    submodules.{k}.sigma_trunk.{i}.linear.weight → experts.sigma_trunk[i].w (transposed)
    submodules.{k}.sigma_head.weight/bias        → experts.sigma_head.w/.b
    submodules.{k}.geo_head.weight/bias          → experts.geo_head.w/.b
    submodules.{k}.color_mlp.{i}.linear.*        → experts.color_mlp[i].*
    submodules.{k}.color_mlp.{n}.weight/bias     → experts.color_mlp[-1].*  (final MetaLinear)
    bg_mlp.{0,2}.weight/bias                     → bg_mlp[0,1].w/.b
    centroids (buffer)                           → buffers.centroids

torch ``nn.Linear`` stores (out, in); ours is (in, out) → transpose.

Hash tables: the torch-fallback encoder's single ``(levels·2^log2, F)``
parameter maps 1:1 onto our **corner** layout (identical 3-prime XOR hash,
reference encodings.py:308-316) — convert with ``--hash_layout corner`` for
bit-faithful parity. A tcnn blob is de-interleaved assuming tcnn's
level-major layout with per-level sizes ``next_multiple(min(2^log2,
(res+1)^3), 8)``; dense (non-hashed) tcnn levels are re-hashed into our
table (collisions resolve last-wins — document as approximate parity).

Usage:
    python -m acn_tpu.scripts.convert_reference_ckpt \
        --src <ref_run_dir> --prefix best --dst logs/converted
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _expert_from_sd(sd: Dict[str, Any], k: int, template: Dict[str, Any],
                    hash_cfg) -> Dict[str, Any]:
    """One expert's params pytree from reference state-dict keys."""
    p = f"submodules.{k}."
    out: Dict[str, Any] = {}

    # ---- hash table ----
    fallback_key = p + "xyz_encoder.hash_table"
    tcnn_key = p + "xyz_encoder._tcnn_enc.params"
    if fallback_key in sd:
        out["hash_table"] = _t2n(sd[fallback_key])
    elif tcnn_key in sd:
        out["hash_table"] = _tcnn_blob_to_corner(_t2n(sd[tcnn_key]), hash_cfg)
    else:
        raise KeyError(f"no hash table for expert {k}")

    # ---- MLPs ----
    def linear(prefix):
        w = _t2n(sd[prefix + ".weight"]).T  # (in, out)
        d = {"w": w}
        if prefix + ".bias" in sd:
            d["b"] = _t2n(sd[prefix + ".bias"])
        return d

    n_trunk = len(template["sigma_trunk"])
    out["sigma_trunk"] = [
        linear(p + f"sigma_trunk.{i}.linear") for i in range(n_trunk)
    ]
    out["sigma_head"] = linear(p + "sigma_head")
    out["geo_head"] = linear(p + "geo_head")
    n_color = len(template["color_mlp"])
    color = [
        linear(p + f"color_mlp.{i}.linear") for i in range(n_color - 1)
    ]
    color.append(linear(p + f"color_mlp.{n_color - 1}"))  # final MetaLinear
    out["color_mlp"] = color
    return out


def _tcnn_blob_to_corner(blob: np.ndarray, cfg) -> np.ndarray:
    """De-interleave a tcnn HashGrid parameter blob into our corner layout
    (levels·2^log2, F). Hashed tcnn levels copy verbatim (tcnn uses the same
    spatial hash); dense levels are re-hashed (approximate under collisions).
    """
    F = cfg.features_per_level
    T = 2 ** cfg.log2_hashmap_size
    res = cfg.level_resolutions()
    out = np.zeros((cfg.levels * T, F), np.float32)
    off = 0
    for l in range(cfg.levels):
        n_dense = (int(res[l]) + 1) ** 3
        n = min(T, n_dense)
        n_aligned = -(-n // 8) * 8
        level = blob[off * F : (off + n) * F].reshape(n, F)
        if n == T:
            out[l * T : (l + 1) * T] = level
        else:
            # dense level: index (x + r(y + r z)) → re-hash into our table
            r = int(res[l]) + 1
            ix, iy, iz = np.meshgrid(
                np.arange(r), np.arange(r), np.arange(r), indexing="ij"
            )
            coords = np.stack(
                [ix.ravel(), iy.ravel(), iz.ravel()], -1
            ).astype(np.uint32)[:n]
            primes = np.array([1, 2654435761, 805459861], np.uint32)
            h = (
                coords[:, 0] * primes[0]
                ^ coords[:, 1] * primes[1]
                ^ coords[:, 2] * primes[2]
            ) & np.uint32(T - 1)
            out[l * T + h.astype(np.int64)] = level
        off += n_aligned
    return out


def reference_state_dict_to_variables(
    sd: Dict[str, Any], cfg, template_variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Map a reference MetaContainer state dict onto our variables pytree
    (stacking experts along K). ``template_variables`` supplies structure +
    buffers (expert AABBs/global AABB come from the dataset's
    scene_boxes.pt, not the torch checkpoint)."""
    import jax

    K = cfg.num_submodules
    t_expert0 = jax.tree.map(
        np.asarray,
        jax.tree.map(lambda a: a[0], template_variables["params"]["experts"]),
    )
    experts = [
        _expert_from_sd(sd, k, t_expert0, cfg.expert.hash) for k in range(K)
    ]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *experts)

    params: Dict[str, Any] = {"experts": stacked}
    if "bg_mlp.0.weight" in sd:
        params["bg_mlp"] = [
            {"w": _t2n(sd["bg_mlp.0.weight"]).T, "b": _t2n(sd["bg_mlp.0.bias"])},
            {"w": _t2n(sd["bg_mlp.2.weight"]).T, "b": _t2n(sd["bg_mlp.2.bias"])},
        ]

    buffers = dict(template_variables["buffers"])
    if "centroids" in sd:
        buffers["centroids"] = _t2n(sd["centroids"])
    return {"params": params, "buffers": buffers}


def main(argv=None):
    import torch

    from acn_tpu.utils.checkpoint import save_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference run dir")
    ap.add_argument("--prefix", default="best")
    ap.add_argument("--dst", required=True, help="output run dir")
    ap.add_argument("--data_path", default="data/drz/")
    ap.add_argument("--data_dirname", default="example")
    ap.add_argument("--mask_dirname", default="g22_grid_bm110_ss11")
    args = ap.parse_args(argv)

    src = Path(args.src)
    sd = torch.load(src / f"{args.prefix}.model", map_location="cpu",
                    weights_only=True)
    # the reference saves `torch.save(vars(P))` — a plain dict, not a
    # Namespace (reference utils.py:262-302); normalize so field reads below
    # see the checkpoint's real architecture instead of fallbacks
    p_raw = torch.load(src / f"{args.prefix}.P", map_location="cpu",
                       weights_only=False)
    p_ns = argparse.Namespace(**p_raw) if isinstance(p_raw, dict) else p_raw

    # rebuild our config from the checkpoint's pinned architecture, corner
    # layout for bit-faithful hash parity
    from acn_tpu.runner import build_model_configs
    from acn_tpu.utils.config import parse_args as parse_ours

    ours = parse_ours([
        "--op", "eval",
        "--data_path", args.data_path,
        "--data_dirname", args.data_dirname,
        "--mask_dirname", args.mask_dirname,
        "--hash_layout", "corner",
        "--num_submodules", str(int(getattr(p_ns, "num_submodules", 4))),
        "--sigma_depth", str(int(getattr(p_ns, "sigma_depth", 2))),
        "--color_depth", str(int(getattr(p_ns, "color_depth", 2))),
        "--dim_hidden", str(int(getattr(p_ns, "dim_hidden", 64))),
        "--color_hidden", str(int(getattr(p_ns, "color_hidden", 64))),
        "--log2_hashmap_size", str(int(getattr(p_ns, "log2_hashmap_size", 20))),
        "--checkpoint_path", "",
        "--fname", "converted",
    ])

    import jax
    import jax.numpy as jnp

    from acn_tpu.data.dataset import load_coordinates
    from acn_tpu.models import container as cont
    from acn_tpu.utils.checkpoint import load_checkpoint  # noqa: F401
    from acn_tpu.utils.logging import Logger  # noqa: F401
    from acn_tpu.data.dataset import load_clustering_meta, load_scene_boxes

    data_path = Path(args.data_path) / "out" / args.data_dirname
    mask_dir = data_path / "masks" / args.mask_dirname
    clustering = load_clustering_meta(mask_dir)
    gaabb, eaabbs = load_scene_boxes(mask_dir)
    cfg = build_model_configs(ours, clustering)
    template = cont.init_container(
        jax.random.PRNGKey(0), cfg,
        jnp.asarray(clustering["centroids"], jnp.float32),
        jnp.asarray(eaabbs), jnp.asarray(gaabb),
    )

    variables = reference_state_dict_to_variables(sd, cfg, template)
    save_checkpoint(args.dst, args.prefix, variables, P=ours, step=0)
    print(f"converted {src}/{args.prefix}.model → {args.dst}/{args.prefix}.model "
          f"(hash_layout=corner; eval with --hash_layout corner)")


if __name__ == "__main__":
    main()
