"""Online/continual stage: test-time optimization and full evaluation.

Counterpart of the reference's ``pipelines/online_stage/runtime_adapt.py``:

* ``runtime_adapt`` — plain Adam fine-tuning of the **whole model in place**
  (not fast weights) on support rays from newly arrived views, for a fixed
  TTO step budget with grad-clip 1.0 (reference runtime_adapt.py:215-315).
  The optimizer state is threaded by the caller so it persists across
  metadata batches exactly like the reference's single ``get_optimizer``
  call (runtime_adapt.py:58).
* ``runtime_evaluate`` — Phase A: per metadata batch of ``test_batch_size``
  views, build a support ray store from ALL rays of those views (the
  reference passes no ``val_balancing`` — adaptation sees the full views)
  and run ``tto`` optimizer steps; Phase B: render every test view
  full-frame and score PSNR / SSIM / LPIPS over the FULL image (reference
  runtime_adapt.py:24-210), dumping pred/gt PNGs.

The TTO loss renders through the same dispatcher Phase B uses — occupancy
marching when occupancy states are available, stratified otherwise — the
reference's ``render_rays`` dispatch (nerfs/ray_rendering.py:564-574) keeps
the two paths consistent.

LPIPS runs a JAX AlexNet-LPIPS port (acn_tpu.models.lpips); see that module
for the weight-loading contract in this egress-free environment.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

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
from acn_tpu.nerfs.render_occ import render_rays_occ
from acn_tpu.nerfs.color import color_space_transformer, linear_to_srgb
from acn_tpu.occupancy.grid import OccConfig
from acn_tpu.pipelines.renderer import Renderer
from acn_tpu.utils.optim import build_optimizer


def make_tto_step(
    cfg: ContainerConfig,
    P,
    optimizer,
    occ_cfg: Optional[OccConfig] = None,
    use_occ: bool = False,
):
    """One Adam step of full-model MSE fine-tuning. Renders the routed
    container through the occupancy path when it is ready (the reference's
    ``render_rays`` dispatcher, ray_rendering.py:564-574), else stratified
    (reference runtime_adapt.py:240-280)."""

    def loss_fn(params, buffers, occ_states, rays, rgbs, key):
        variables = {"params": params, "buffers": buffers}
        k_bg, k_render = jax.random.split(key)
        dirs = rays[:, 3:6]
        if cfg.use_bg_nerf:
            bg = cont.background_color(variables, cfg, dirs)
        elif P.bg_color_default == "none":
            bg = None
        else:
            bg = bg_default_color(k_bg, rays.shape[0], P.bg_color_default)
        if use_occ:
            rgb_map, _, _, _ = render_rays_occ(
                variables, occ_states, cfg, occ_cfg, rays,
                s_max=int(P.occ_s_max), s_kept=int(P.occ_s_kept),
                alpha_thre=float(occ_cfg.alpha_thre),
                key=k_render, bg_rgb=bg,
            )
        else:
            model_fn = lambda xd: cont.container_forward(variables, cfg, xd)
            rgb_map, _, _, _ = render_rays_stratified(
                model_fn, rays, int(P.ray_samples), key=k_render,
                randomized=True, bg_rgb=bg,
            )
        return aligned_mse_loss(rgb_map, rgbs, P.color_space)

    @jax.jit
    def tto_step(params, opt_state, buffers, occ_states, rays, rgbs, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, buffers, occ_states, rays, rgbs, key
        )
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
    optimizer=None,
    opt_state=None,
    tto_step_fn=None,
    occ_cfg: Optional[OccConfig] = None,
    occ_states=None,
) -> Tuple[Dict[str, Any], Any, float]:
    """Fine-tune the whole model for ``tto_steps`` Adam updates on the
    support stream (reference runtime_adapt.py:215-315, steps-budget branch).

    Pass ``optimizer``/``opt_state``/``tto_step_fn`` to persist optimizer
    moments across calls (the reference shares one optimizer over all
    metadata batches). Returns (adapted variables, opt_state, last_loss).
    """
    if tto_steps <= 0 or len(support) == 0:
        return variables, opt_state, float("nan")
    rng = rng or np.random.default_rng(P.seed)
    batch_rays = batch_rays or int(P.support_rays)

    if optimizer is None:
        labels = cont.param_group_labels(variables, cfg)
        optimizer = build_optimizer(P, labels, grad_clip=1.0)
    use_occ = occ_cfg is not None and occ_states is not None
    if tto_step_fn is None:
        tto_step_fn = make_tto_step(cfg, P, optimizer, occ_cfg, use_occ)
    if not use_occ:
        occ_states = jnp.zeros(())  # inert placeholder leaf

    params = variables["params"]
    buffers = variables["buffers"]
    if opt_state is None:
        opt_state = optimizer.init(params)
    loss = None
    for _ in range(int(tto_steps)):
        rays, rgbs, _ = support.sample(rng, batch_rays)
        key, k = jax.random.split(key)
        params, opt_state, loss = tto_step_fn(
            params, opt_state, buffers, occ_states,
            jnp.asarray(rays), jnp.asarray(rgbs), k,
        )
    last = float(jax.device_get(loss)) if loss is not None else float("nan")
    return {"params": params, "buffers": buffers}, opt_state, last


def _to_png(path: Path, img01: np.ndarray) -> None:
    from PIL import Image

    arr = (np.clip(img01, 0, 1) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def runtime_evaluate(ctx: Dict[str, Any], tto: int) -> Dict[str, float]:
    """TTO sweep evaluation (reference runtime_evaluate, runtime_adapt.py:24-210).

    Phase A adapts per metadata batch (``test_batch_size`` views at a time,
    ``tto`` optimizer steps each, one persistent optimizer — reference
    runtime_adapt.py:58-99); Phase B renders every val view and scores
    PSNR/SSIM/LPIPS over full images, writing pred/gt PNGs under the run dir.
    """
    P = ctx["P"]
    cfg: ContainerConfig = ctx["cfg"]
    occ_cfg: Optional[OccConfig] = ctx["occ_cfg"]
    logger = ctx["logger"]
    variables = ctx["variables"]
    occ_states = ctx["occ_states"]
    test_meta: List[ImageMetadata] = ctx["test_metadata"]
    global_aabb = np.asarray(ctx["global_aabb"])
    use_occ = occ_cfg is not None and occ_states is not None

    key = jax.random.PRNGKey(P.seed)
    logger.log(f"======== TTO: {tto} ========")

    baked = ctx.get("baked_renderer")
    if baked is not None and tto > 0:
        # a baked table is a frozen distillation — there are no fast weights
        # to adapt; score it once under tto=0 semantics instead
        logger.log(
            "[baked] --baked_asset set: TTO does not apply to a baked "
            f"table; rendering tto={tto} leg without adaptation"
        )

    # ---- Phase A: per-metadata-batch TTO on the eval views' rays ----
    t0 = time.perf_counter()
    if tto > 0 and baked is None:
        labels = cont.param_group_labels(variables, cfg)
        optimizer = build_optimizer(P, labels, grad_clip=1.0)
        tto_step_fn = make_tto_step(cfg, P, optimizer, occ_cfg, use_occ)
        opt_state = None
        bs = max(int(getattr(P, "test_batch_size", 1)), 1)
        rng = np.random.default_rng(P.seed)
        total_support = 0
        for bi in range(0, len(test_meta), bs):
            metas = test_meta[bi : bi + bs]
            support = RamRaysDataset(
                metas,
                center_pixels=True,
                val_balancing=False,  # reference adapts on ALL rays of the views
                aabb=global_aabb,
                near_far_override=(P.near, P.far),
                num_workers=P.num_workers,
            )
            total_support += len(support)
            key, k = jax.random.split(key)
            variables, opt_state, last = runtime_adapt(
                variables, cfg, P, support, tto, k, rng=rng,
                optimizer=optimizer, opt_state=opt_state,
                tto_step_fn=tto_step_fn, occ_cfg=occ_cfg,
                occ_states=occ_states if use_occ else None,
            )
            logger.log(
                f"[Batch {bi // bs + 1}] rays={len(support)} last_loss={last:.6f}"
            )
        logger.log(
            f"[ADAPTATION END] [{time.perf_counter() - t0:.2f}s] "
            f"total support rays: {total_support}"
        )
    duration = time.perf_counter() - t0

    # ---- Phase B: full-frame rendering + metrics over FULL images ----
    renderer = Renderer(cfg, P, occ_cfg) if baked is None else None
    out_root = Path(logger.logdir) / "rendered"
    out_pred = out_root / f"pred{tto}"
    out_gt = out_root / "gt"
    out_pred.mkdir(parents=True, exist_ok=True)
    out_gt.mkdir(parents=True, exist_ok=True)

    from acn_tpu.models.lpips import get_lpips

    lpips_model = get_lpips()
    # Never print random-weight LPIPS as if it were the official metric: with
    # no pretrained AlexNet on this host the scores are not comparable to the
    # reference's, so the 'lpips' column stays n/a and the run says why once.
    lpips_ok = lpips_model is not None and lpips_model.pretrained
    if not lpips_ok:
        logger.log(
            "[LPIPS] n/a — no pretrained AlexNet weights found; drop "
            "lpips_alex.npz in (see acn_tpu/models/lpips.py) for official values"
        )
    psnrs, ssims, lpipss = [], [], []
    for i, md in enumerate(test_meta):
        key, k = jax.random.split(key)
        if baked is not None:
            rgb_pred, _, _ = baked.render_image(
                H=md.H, W=md.W, intrinsics=md.intrinsics, c2w=md.c2w,
                near_far_override=(P.near, P.far),
            )
        else:
            rgb_pred, _, _ = renderer.render_image(
                variables,
                occ_states,
                H=md.H,
                W=md.W,
                intrinsics=md.intrinsics,
                c2w=md.c2w,
                aabb=global_aabb,
                key=k,
                use_occ=use_occ,
                near_far_override=(P.near, P.far),
            )
        gt_srgb = md.load_image().astype(np.float32) / 255.0

        pred_cs, gt_cs = color_space_transformer(
            jnp.asarray(rgb_pred), jnp.asarray(gt_srgb), P.color_space
        )
        psnrs.append(float(psnr_fn(pred_cs, gt_cs)))
        ssims.append(float(ssim_fn(pred_cs, gt_cs)))

        # LPIPS in sRGB space scaled to [-1, 1] (reference runtime_adapt.py:158-167)
        pred_srgb = (
            np.asarray(pred_cs) if P.color_space == "srgb"
            else np.asarray(linear_to_srgb(jnp.asarray(rgb_pred)))
        )
        if lpips_ok:
            lpipss.append(float(lpips_model(pred_srgb, gt_srgb)))

        _to_png(out_pred / f"{i:06d}.png", pred_srgb)
        _to_png(out_gt / f"{i:06d}.png", gt_srgb)
        logger.log(
            f" * [IMG {i + 1}] PSNR {psnrs[-1]:.3f} | SSIM {ssims[-1]:.3f}"
            + (f" | LPIPS {lpipss[-1]:.3f}" if lpips_ok else " | LPIPS n/a")
        )

    return {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
        "duration": duration,
        "n_views": len(test_meta),
    }
