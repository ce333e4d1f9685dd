"""LPIPS perceptual metric — JAX AlexNet-LPIPS port.

The reference scores eval renders with ``lpips.LPIPS(net="alex")``
(reference pipelines/online_stage/runtime_adapt.py:111, 158-167): AlexNet
conv features at the five ReLU taps, channel-unit-normalized, squared
difference, per-layer learned 1×1 linear weighting, spatial mean, summed
over layers, on inputs scaled to [-1, 1].

This module reimplements that computation in pure JAX:

* ``alexnet_features`` — the torchvision AlexNet feature stack (conv
  geometry identical: 64/192/384/256/256 channels, 11/5/3/3/3 kernels,
  strides 4/1/1/1/1, pads 2/2/1/1/1, maxpool 3×3 s2 after taps 1 and 2),
  NCHW layout;
* ``lpips_distance`` — normalize → feature diff² → linear head → mean.

Weights: this environment is egress-free and ships no pretrained AlexNet
or LPIPS checkpoints, so exact-parity weights cannot be baked in. The
loader tries, in order:

1. ``$ACN_LPIPS_WEIGHTS`` or ``~/.cache/acn_tpu/lpips_alex.npz`` — an npz
   export of the official weights (convert once anywhere with the standard
   ``lpips`` package via ``export_lpips_npz`` below, then drop the file in);
   with it, scores match torch-lpips to float tolerance.
2. A **deterministic He-initialized fallback** (seed 0) — the well-studied
   "random-feature LPIPS" variant; scores are self-consistent (same
   ordering-quality within a run, 0 for identical images, monotone in
   distortion) but NOT numerically comparable to official LPIPS. The
   metric is then reported as ``lpips(rand-alex)``.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# (out_ch, in_ch, kernel, stride, pad) per conv; maxpool(3, 2) after convs 0, 1
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}
# ImageNet normalization used by lpips.ScalingLayer (shift/scale on [-1,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: Array, w: Array, b: Optional[Array], stride: int, pad: int) -> Array:
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _maxpool(x: Array, k: int = 3, s: int = 2) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def alexnet_features(params: Dict[str, Array], x: Array) -> List[Array]:
    """x (N, 3, H, W) → list of 5 post-ReLU feature maps (NCHW)."""
    feats = []
    h = x
    for i, (_, _, _, stride, pad) in enumerate(_ALEX_CONVS):
        h = _conv(h, params[f"conv{i}_w"], params.get(f"conv{i}_b"), stride, pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(f: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params: Dict[str, Array], x: Array, y: Array) -> Array:
    """LPIPS(x, y) for NCHW images in [-1, 1]. Returns (N,)."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fx = alexnet_features(params, (x - shift) / scale)
    fy = alexnet_features(params, (y - shift) / scale)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # (N, C, H, W)
        w = params[f"lin{i}_w"]  # (C,) non-negative per-channel weights
        lv = jnp.sum(d * w[None, :, None, None], axis=1)  # (N, H, W)
        total = total + jnp.mean(lv, axis=(1, 2))
    return total


def _rand_params(seed: int = 0) -> Dict[str, Array]:
    """Deterministic He-init fallback (no pretrained weights on this host)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Array] = {}
    for i, (oc, ic, k, _, _) in enumerate(_ALEX_CONVS):
        std = float(np.sqrt(2.0 / (ic * k * k)))
        params[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0.0, std, (oc, ic, k, k)).astype(np.float32)
        )
        params[f"conv{i}_b"] = jnp.zeros((oc,), jnp.float32)
        params[f"lin{i}_w"] = jnp.full((oc,), 1.0 / oc, jnp.float32)
    return params


def _weights_path() -> Optional[Path]:
    p = os.environ.get("ACN_LPIPS_WEIGHTS")
    cands = [Path(p)] if p else []
    cands.append(Path.home() / ".cache" / "acn_tpu" / "lpips_alex.npz")
    for c in cands:
        if c.is_file():
            return c
    return None


def load_params() -> Tuple[Dict[str, Array], bool]:
    """Returns (params, pretrained?)."""
    path = _weights_path()
    if path is not None:
        with np.load(path) as z:
            return {k: jnp.asarray(z[k]) for k in z.files}, True
    return _rand_params(), False


class LPIPS:
    """Callable scoring two (H, W, 3) float sRGB images in [0, 1]."""

    def __init__(self):
        self.params, self.pretrained = load_params()
        self.name = "lpips" if self.pretrained else "lpips(rand-alex)"
        self._fn = jax.jit(lpips_distance)

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float:
        p = jnp.asarray(pred, jnp.float32).transpose(2, 0, 1)[None] * 2.0 - 1.0
        g = jnp.asarray(gt, jnp.float32).transpose(2, 0, 1)[None] * 2.0 - 1.0
        return float(self._fn(self.params, p, g)[0])


@lru_cache(maxsize=1)
def get_lpips() -> LPIPS:
    return LPIPS()


def export_lpips_npz(out_path: str) -> None:
    """Run on any host with the ``lpips`` pip package + weights to export the
    official AlexNet-LPIPS parameters to the npz layout this module loads.
    (Not runnable in the egress-free environment — provided for parity.)"""
    import lpips as lpips_pkg  # noqa: F401

    model = lpips_pkg.LPIPS(net="alex")
    out: Dict[str, np.ndarray] = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    convs = [m for m in convs if m.__class__.__name__ == "Conv2d"]
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        out[f"lin{i}_w"] = lin.model[1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **out)
