"""Losses and image metrics.

Counterpart of the reference's ``nerfs/losses.py`` (render + color-space align
+ MSE, losses.py:10-32) and ``utils.psnr`` (utils.py:538-539). The Fisher
(FIM) loss of the reference is scaffolded-but-unwired there (losses.py:76
guard never passes); here it lives behind ``acn_tpu.models.fim`` and is only
used when explicitly enabled.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from acn_tpu.nerfs.color import color_space_transformer

Array = jnp.ndarray


def mse(pred: Array, gt: Array) -> Array:
    return jnp.mean((pred - gt) ** 2)


def aligned_mse_loss(
    pred_linear: Array, gt_srgb: Array, color_space: str = "linear"
) -> Array:
    """Color-space-aligned MSE (reference losses.py:10-32)."""
    pred, gt = color_space_transformer(pred_linear, gt_srgb, color_space)
    return mse(pred, gt)


def psnr_from_mse(mse_val: Array, eps: float = 1e-12) -> Array:
    """PSNR = −10 log10(mse) (reference utils.py:538-539)."""
    return -10.0 * jnp.log10(jnp.maximum(mse_val, eps))


def psnr(pred: Array, gt: Array) -> Array:
    return psnr_from_mse(mse(pred, gt))


def ssim(
    img0: Array,  # (H, W, C) in [0, 1]
    img1: Array,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Single-scale SSIM with a Gaussian window (standard Wang et al. 2004
    formulation; fills the role of pytorch-msssim in the reference's eval,
    reference online_stage/runtime_adapt.py:158-167).

    The blur MUST accumulate in float32: TPU convs default to bf16, whose
    ~3-digit mantissa corrupts the E[x²]−μ² variance terms past the c2
    stabilizer — windows then divide by negative variance and SSIM escapes
    its mathematical [-1, 1] range (observed −5.4 on a near-constant
    prediction). ``Precision.HIGHEST`` pins f32 accumulation."""
    import jax

    hw = filter_size // 2
    offsets = jnp.arange(-hw, hw + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (offsets / filter_sigma) ** 2)
    g = g / jnp.sum(g)

    def _filt(img):  # separable Gaussian blur over H and W, per channel
        x = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[:, None]  # (C,1,H,W)
        dn = ("NCHW", "OIHW", "NCHW")
        for kern in (g[None, None, :, None], g[None, None, None, :]):
            x = jax.lax.conv_general_dilated(
                x, kern, (1, 1), "VALID", dimension_numbers=dn,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.moveaxis(x[:, 0], 0, -1)

    mu0 = _filt(img0)
    mu1 = _filt(img1)
    s00 = _filt(img0 * img0) - mu0 * mu0
    s11 = _filt(img1 * img1) - mu1 * mu1
    s01 = _filt(img0 * img1) - mu0 * mu1

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)
