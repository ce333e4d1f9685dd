"""sRGB ↔ linear color-space conversions.

Counterpart of the reference's ``nerfs/color_space.py``: the model predicts
linear RGB, 8-bit ground truth is sRGB, and exactly one side is converted so
loss/metrics compare in a single space.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def linear_to_srgb(x: Array) -> Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 1e-12), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(x: Array) -> Array:
    return jnp.where(
        x <= 0.04045,
        x / 12.92,
        jnp.power(jnp.maximum((x + 0.055) / 1.055, 1e-12), 2.4),
    )


def color_space_transformer(
    pred_linear: Array, gt_srgb: Array, color_space: str
) -> Tuple[Array, Array]:
    """Put prediction (linear) and GT (sRGB) in one space
    (reference color_space.py:22-66).

    ``color_space``: "linear" | "srgb" | "identity".
    """
    cs = str(color_space).lower()
    pred32 = pred_linear.astype(jnp.float32)
    gt32 = jnp.clip(gt_srgb.astype(jnp.float32), 0.0, 1.0)

    if cs == "linear":
        pred = jnp.clip(pred32, 0.0, 1.0)
        gt = jnp.clip(srgb_to_linear(gt32), 0.0, 1.0)
    elif cs == "srgb":
        pred = jnp.clip(linear_to_srgb(pred32), 0.0, 1.0)
        gt = gt32
    elif cs == "identity":
        pred = pred32
        gt = gt32
    else:
        raise ValueError(
            f"Invalid color_space={color_space!r}; use 'linear'|'srgb'|'identity'"
        )
    return pred.astype(pred_linear.dtype), gt.astype(pred_linear.dtype)
