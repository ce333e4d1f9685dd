"""Online/continual stage: test-time optimization and full evaluation.

Counterpart of the reference's ``pipelines/online_stage/runtime_adapt.py``:

* ``runtime_adapt`` — plain Adam fine-tuning of the **whole model in place**
  (not fast weights) on support rays from newly arrived views, for a fixed
  TTO step budget with grad-clip 1.0 (reference runtime_adapt.py:213-315);
* ``runtime_evaluate`` — Phase A: per continual/metadata batch, build a
  support ray store from the new views and run TTO; Phase B: render every
  test view full-frame and score PSNR / SSIM / LPIPS, dumping pred/gt PNGs
  (reference runtime_adapt.py:24-210).

LPIPS uses AlexNet features; with no pretrained weights available the metric
reports NaN and says so (the framework is egress-free).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acn_tpu.data.image_metadata import ImageMetadata
from acn_tpu.data.ram_rays import RamRaysDataset
from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.nerfs.losses import aligned_mse_loss, psnr as psnr_fn, ssim as ssim_fn
from acn_tpu.nerfs.render import bg_default_color, render_rays_stratified
from acn_tpu.nerfs.color import color_space_transformer
from acn_tpu.occupancy.grid import OccConfig
from acn_tpu.pipelines.renderer import Renderer
from acn_tpu.utils.optim import build_optimizer


def make_tto_step(cfg: ContainerConfig, P, optimizer):
    """One Adam step of full-model MSE fine-tuning (stratified render of the
    routed container; reference runtime_adapt.py:240-280)."""

    def loss_fn(params, buffers, rays, rgbs, key):
        variables = {"params": params, "buffers": buffers}
        k_bg, k_render = jax.random.split(key)
        dirs = rays[:, 3:6]
        if cfg.use_bg_nerf:
            bg = cont.background_color(variables, cfg, dirs)
        elif P.bg_color_default == "none":
            bg = None
        else:
            bg = bg_default_color(k_bg, rays.shape[0], P.bg_color_default)
        model_fn = lambda xd: cont.container_forward(variables, cfg, xd)
        rgb_map, _, _, _ = render_rays_stratified(
            model_fn, rays, int(P.ray_samples), key=k_render, randomized=True,
            bg_rgb=bg,
        )
        return aligned_mse_loss(rgb_map, rgbs, P.color_space)

    @jax.jit
    def tto_step(params, opt_state, buffers, rays, rgbs, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, buffers, rays, rgbs, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tto_step


def runtime_adapt(
    variables: Dict[str, Any],
    cfg: ContainerConfig,
    P,
    support: RamRaysDataset,
    tto_steps: int,
    key: jax.Array,
    batch_rays: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, Any]:
    """Fine-tune the whole model for ``tto_steps`` Adam updates on the
    support stream. Returns the adapted variables."""
    if tto_steps <= 0 or len(support) == 0:
        return variables
    rng = rng or np.random.default_rng(P.seed)
    batch_rays = batch_rays or int(P.support_rays)

    labels = cont.param_group_labels(variables, cfg)
    optimizer = build_optimizer(P, labels, grad_clip=1.0)
    tto = make_tto_step(cfg, P, optimizer)

    params = variables["params"]
    buffers = variables["buffers"]
    opt_state = optimizer.init(params)
    for _ in range(int(tto_steps)):
        rays, rgbs, _ = support.sample(rng, batch_rays)
        key, k = jax.random.split(key)
        params, opt_state, _ = tto(
            params, opt_state, buffers, jnp.asarray(rays), jnp.asarray(rgbs), k
        )
    return {"params": params, "buffers": buffers}


def _to_png(path: Path, img01: np.ndarray) -> None:
    from PIL import Image

    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def runtime_evaluate(ctx: Dict[str, Any], tto: int) -> Dict[str, float]:
    """TTO sweep evaluation (reference runtime_evaluate, runtime_adapt.py:24-210).

    Phase A adapts on the val views' rays (or continual batches when present);
    Phase B renders every val view and scores PSNR/SSIM (LPIPS when weights
    are available), writing pred/gt PNGs under the run dir.
    """
    P = ctx["P"]
    cfg: ContainerConfig = ctx["cfg"]
    occ_cfg: Optional[OccConfig] = ctx["occ_cfg"]
    logger = ctx["logger"]
    variables = ctx["variables"]
    occ_states = ctx["occ_states"]
    test_meta: List[ImageMetadata] = ctx["test_metadata"]
    global_aabb = np.asarray(ctx["global_aabb"])

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(P.seed)

    # ---- Phase A: TTO on support rays from the eval views ----
    if tto > 0:
        support = RamRaysDataset(
            test_meta,
            center_pixels=True,
            val_balancing=True,  # adapt on the left half, score the right
            aabb=global_aabb,
            near_far_override=(P.near, P.far),
            num_workers=P.num_workers,
        )
        key, k = jax.random.split(key)
        variables = runtime_adapt(variables, cfg, P, support, tto, k)

    duration = time.perf_counter() - t0

    # ---- Phase B: full-frame rendering + metrics ----
    renderer = Renderer(cfg, P, occ_cfg)
    out_dir = Path(logger.logdir) / "rendered" / f"tto_{tto}"
    out_dir.mkdir(parents=True, exist_ok=True)

    psnrs, ssims, lpipss = [], [], []
    lpips_model = _try_lpips()
    for i, md in enumerate(test_meta):
        key, k = jax.random.split(key)
        rgb_pred, _, _ = renderer.render_image(
            variables,
            occ_states,
            H=md.H,
            W=md.W,
            intrinsics=md.intrinsics,
            c2w=md.c2w,
            aabb=global_aabb,
            key=k,
            use_occ=(occ_cfg is not None and occ_states is not None),
            near_far_override=(P.near, P.far),
        )
        gt_srgb = md.load_image().astype(np.float32) / 255.0

        # score the right half only — the half TTO never saw
        # (Mega-NeRF protocol; reference val balancing keeps left for support)
        half = md.W // 2
        pred_eval = rgb_pred[:, half:]
        gt_eval = gt_srgb[:, half:]

        pred_cs, gt_cs = color_space_transformer(
            jnp.asarray(pred_eval), jnp.asarray(gt_eval), P.color_space
        )
        psnrs.append(float(psnr_fn(pred_cs, gt_cs)))
        ssims.append(float(ssim_fn(pred_cs, gt_cs)))
        if lpips_model is not None:
            lpipss.append(float(lpips_model(np.asarray(pred_cs), np.asarray(gt_cs))))

        _to_png(out_dir / f"{i:06d}_pred.png", rgb_pred)
        _to_png(out_dir / f"{i:06d}_gt.png", gt_srgb)
        logger.log(
            f"[eval tto={tto}] view {i + 1}/{len(test_meta)} psnr {psnrs[-1]:.2f}"
        )

    return {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
        "duration": duration,
        "n_views": len(test_meta),
    }


def _try_lpips():
    """LPIPS needs pretrained AlexNet weights; return None when unavailable
    (no network egress). Callers report NaN."""
    try:
        import lpips  # noqa: F401
        import torch

        model = lpips.LPIPS(net="alex")

        def score(pred, gt):
            p = torch.from_numpy(pred).permute(2, 0, 1)[None] * 2 - 1
            g = torch.from_numpy(gt).permute(2, 0, 1)[None] * 2 - 1
            with torch.no_grad():
                return float(model(p.float(), g.float()).item())

        return score
    except Exception:
        return None
