"""--op eval --baked_asset: the eval protocol scores a baked asset
(full-image PSNR/SSIM vs gt) with TTO legs degrading to no-adaptation.
Complements the CLI verify drives with a hermetic in-process check."""

import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from acn_tpu.data.image_metadata import ImageMetadata
from acn_tpu.pipelines.baking import BakedRenderer, bake_field
from acn_tpu.pipelines.online_stage.runtime_adapt import runtime_evaluate

AABB = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)


class _Logger:
    def __init__(self):
        self.logdir = None
        self.lines = []

    def log(self, msg):
        self.lines.append(str(msg))


def test_eval_protocol_scores_baked_asset(tmp_path):
    # a solid constant-color blob field, baked
    def field_fn(xd):
        x = xd[:, :3]
        sig = jnp.where(jnp.linalg.norm(x, axis=-1) < 0.6, 8.0, 0.0)
        return sig, jnp.broadcast_to(
            jnp.asarray([0.8, 0.4, 0.2]), (xd.shape[0], 3))

    baked = bake_field(field_fn, AABB, 33, bake_dirs=2, chunk=8192,
                       occ_resolution=16, occ_thre=1e-4)
    br = BakedRenderer(baked, s_max=64, budget_per_ray=24, chunk_points=8192)

    # one synthetic val view whose gt IS the baked render → PSNR must be high
    H = W = 24
    intr = np.array([0.8 * H, 0.8 * H, W / 2, H / 2], np.float32)
    c2w = np.array([[0.0, 0.0, -1.0, -2.5],
                    [0.0, 1.0, 0.0, 0.0],
                    [1.0, 0.0, 0.0, 0.0]], np.float32)
    rgb, _, _ = br.render_image(H=H, W=W, intrinsics=intr, c2w=c2w)
    # the eval protocol treats gt PNGs as sRGB and predictions as linear
    from acn_tpu.nerfs.color import linear_to_srgb
    rgb_srgb = np.asarray(linear_to_srgb(jnp.asarray(np.clip(rgb, 0, 1))))
    gt_path = tmp_path / "view0.png"
    Image.fromarray((rgb_srgb * 255).round().astype(np.uint8)).save(gt_path)
    md = ImageMetadata(image_path=gt_path, c2w=c2w, W=W, H=H,
                       intrinsics=intr, image_index=0, is_val=True)

    logger = _Logger()
    logger.logdir = tmp_path
    P = types.SimpleNamespace(
        seed=0, near=None, far=None, color_space="srgb",
        test_batch_size=1, num_workers=None,
    )
    ctx = {
        "P": P, "cfg": None, "occ_cfg": None, "logger": logger,
        "variables": None, "occ_states": None, "test_metadata": [md],
        "global_aabb": AABB, "baked_renderer": br,
    }
    res = runtime_evaluate(ctx, tto=0)
    assert res["n_views"] == 1
    assert res["psnr"] > 35.0  # gt == render up to png quantization
    assert 0.9 < res["ssim"] <= 1.0

    # tto>0 leg must not crash (no adaptation on a frozen table) and must
    # log why
    res16 = runtime_evaluate(ctx, tto=16)
    assert res16["psnr"] > 35.0
    assert any("TTO does not apply" in l for l in logger.lines)


def test_strided_baked_render_survives_dense_occupancy():
    """Round-6 regression: on a DENSE baked occupancy grid the global
    budget pack drops valid samples batch-tail-first (frame rows fall to
    background — 5.45 dB on the real field); budget_per_ray=0 switches
    render_baked_rays to the unbiased per-ray strided marcher, which must
    stay faithful at any grid density."""

    def field_fn(xd):
        x = xd[:, :3]
        sig = jnp.where(jnp.abs(x[:, 0]) < 0.8, 6.0, 0.0)  # thick slab
        return sig, jnp.broadcast_to(
            jnp.asarray([0.2, 0.7, 0.3]), (xd.shape[0], 3))

    # occ_thre tiny → the baked grid is ~fully dense inside the AABB
    baked = bake_field(field_fn, AABB, 33, bake_dirs=2, chunk=8192,
                       occ_resolution=16, occ_thre=1e-6)
    H = W = 16
    intr = np.array([0.8 * H, 0.8 * H, W / 2, H / 2], np.float32)
    c2w = np.array([[0.0, 0.0, -1.0, -2.5],
                    [0.0, 1.0, 0.0, 0.0],
                    [1.0, 0.0, 0.0, 0.0]], np.float32)

    # generous strided reference (the quality protocol marcher)
    br_strided = BakedRenderer(baked, s_max=64, budget_per_ray=0,
                               chunk_points=4096)
    rgb_s, _, acc_s = br_strided.render_image(H=H, W=W, intrinsics=intr,
                                              c2w=c2w)
    # a starved budget on the dense grid: tail rays lose their samples
    br_starved = BakedRenderer(baked, s_max=64, budget_per_ray=2,
                               chunk_points=4096)
    rgb_b, _, acc_b = br_starved.render_image(H=H, W=W, intrinsics=intr,
                                              c2w=c2w)

    # central rays traverse the slab: strided composites to ~full opacity
    # (frustum-edge rays exit the AABB early — exclude them)
    ctr = (slice(H // 4, 3 * H // 4), slice(W // 4, 3 * W // 4))
    acc_s2 = np.asarray(acc_s).reshape(H, W)[ctr]
    acc_b2 = np.asarray(acc_b).reshape(H, W)[ctr]
    assert float(np.mean(acc_s2)) > 0.9
    # the starved budget demonstrably loses coverage vs strided
    assert float(np.mean(acc_b2)) < float(np.mean(acc_s2)) - 0.2
    # and the strided render matches the field color where opaque
    center = np.asarray(rgb_s).reshape(H, W, 3)[H // 2, W // 2]
    assert np.allclose(center, [0.2, 0.7, 0.3], atol=0.1)
