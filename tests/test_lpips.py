"""LPIPS JAX port: architecture + metric-property tests.

Official pretrained weights are unavailable in this egress-free image, so
these tests validate the *computation* (feature geometry identical to
torchvision AlexNet, metric axioms) on the deterministic fallback weights;
with a real ``lpips_alex.npz`` dropped in, the same code is exact LPIPS.
"""

import numpy as np
import jax.numpy as jnp

from acn_tpu.models import lpips as L


def test_alexnet_feature_shapes():
    """Feature-map geometry must match torchvision AlexNet.features on a
    224×224 input: the well-known (64,55,55),(192,27,27),(384,13,13),
    (256,13,13),(256,13,13) progression (post-ReLU taps)."""
    params = L._rand_params()
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    feats = L.alexnet_features(params, x)
    shapes = [tuple(f.shape[1:]) for f in feats]
    assert shapes == [
        (64, 55, 55),
        (192, 27, 27),
        (384, 13, 13),
        (256, 13, 13),
        (256, 13, 13),
    ]


def test_lpips_axioms():
    m = L.LPIPS()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)

    # identity → 0
    assert m(img, img) == 0.0

    # symmetry
    other = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    np.testing.assert_allclose(m(img, other), m(other, img), rtol=1e-5)

    # monotone in distortion magnitude
    noise = rng.normal(0, 1, img.shape).astype(np.float32)
    d_small = m(img, np.clip(img + 0.02 * noise, 0, 1))
    d_large = m(img, np.clip(img + 0.2 * noise, 0, 1))
    assert 0.0 < d_small < d_large


def test_lpips_weight_roundtrip(tmp_path, monkeypatch):
    """npz weights load verbatim through the $ACN_LPIPS_WEIGHTS path."""
    params = L._rand_params(seed=3)
    p = tmp_path / "w.npz"
    np.savez(p, **{k: np.asarray(v) for k, v in params.items()})
    monkeypatch.setenv("ACN_LPIPS_WEIGHTS", str(p))
    loaded, pretrained = L.load_params()
    assert pretrained
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))
