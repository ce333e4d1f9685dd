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
