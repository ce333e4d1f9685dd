import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.models.encodings import HashGridConfig
from acn_tpu.models.ngp import NGPConfig, init_ngp, ngp_density, ngp_forward
from acn_tpu.models.vanilla import VanillaConfig, init_vanilla, vanilla_forward
from acn_tpu.nerfs import scene_box as sbox

SMALL_HASH = HashGridConfig(levels=4, min_res=4, max_res=64, log2_hashmap_size=10)


def _ngp_cfg(**kw):
    return NGPConfig(hidden=16, color_hidden=16, hash=SMALL_HASH, **kw)


def test_ngp_shapes_and_finiteness():
    cfg = _ngp_cfg()
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    aabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    xd = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    out = ngp_forward(params, cfg, aabb, xd)
    assert out.shape == (128, 4)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert (o[:, :3] >= 0).all() and (o[:, :3] <= 1).all()  # sigmoid rgb
    assert (o[:, 3] >= 0).all()  # trunc_exp sigma


def test_ngp_density_bias_init():
    # sigma_head bias −1 ⇒ with near-zero activations σ ≈ exp(−1)
    cfg = _ngp_cfg()
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    x = jnp.full((16, 3), 0.5)
    sig = np.asarray(ngp_density(params, cfg, aabb, x))
    # hash features are ~1e-3 at init, trunk output tiny ⇒ σ near exp(−1)
    np.testing.assert_allclose(sig, np.exp(-1.0), rtol=0.2)


def test_ngp_frequency_dir_encoding():
    cfg = _ngp_cfg(dir_encoding="frequency")
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    aabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    xd = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    assert ngp_forward(params, cfg, aabb, xd).shape == (8, 4)


def test_ngp_grad_all_params():
    cfg = _ngp_cfg()
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    aabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    xd = jax.random.normal(jax.random.PRNGKey(1), (64, 6))

    g = jax.grad(lambda p: jnp.sum(ngp_forward(p, cfg, aabb, xd)))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # every leaf receives some gradient
    nonzero = [float(jnp.sum(jnp.abs(x))) > 0 for x in leaves]
    assert all(nonzero), nonzero


def test_vanilla_forward_and_skip():
    cfg = VanillaConfig(hidden=32, sigma_depth=5, skips=(2,), color_hidden=16)
    params = init_vanilla(jax.random.PRNGKey(0), cfg)
    # skip layer has widened input
    assert params["trunk"][2]["w"].shape[0] == 32 + cfg.xyz_enc_dim
    aabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    xd = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    out = vanilla_forward(params, cfg, aabb, xd)
    assert out.shape == (32, 4)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------- container / routing -------------------------


def _toy_container(margin=1.1, K=4):
    cfg = ContainerConfig(
        num_submodules=K,
        boundary_margin=margin,
        cluster_2d=True,
        use_bg_nerf=True,
        expert=_ngp_cfg(),
    )
    # 2×2 grid of centroids in YZ
    cents = jnp.array(
        [[0.0, -0.5, -0.5], [0.0, -0.5, 0.5], [0.0, 0.5, -0.5], [0.0, 0.5, 0.5]]
    )[:K]
    boxes = jnp.stack(
        [sbox.make_aabb([-1, -1, -1], [1, 1, 1]) for _ in range(K)]
    )
    gaabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    vars_ = cont.init_container(jax.random.PRNGKey(0), cfg, cents, boxes, gaabb)
    return cfg, vars_


def _np_routing(cents, pts, cluster_2d, margin):
    """Numpy oracle for MetaContainer._routing (meta_container.py:116-134)."""
    idx = (1, 2) if cluster_2d else (0, 1, 2)
    d = np.linalg.norm(pts[:, None, idx] - cents[None, :, idx], axis=-1)
    if margin > 1.0:
        d = np.maximum(d, 1e-6)
        invd = 1.0 / d
        mind = d.min(axis=1, keepdims=True)
        invd = invd * (d <= margin * mind)
        return invd / np.maximum(invd.sum(axis=1, keepdims=True), 1e-6)
    w = np.zeros((len(pts), len(cents)))
    w[np.arange(len(pts)), d.argmin(axis=1)] = 1.0
    return w


def test_routing_soft_matches_reference_math():
    cents = np.array(
        [[0.0, -0.5, -0.5], [0.0, -0.5, 0.5], [0.0, 0.5, -0.5], [0.0, 0.5, 0.5]],
        np.float32,
    )
    pts = np.random.RandomState(0).uniform(-1, 1, (512, 3)).astype(np.float32)
    w = np.asarray(
        cont.routing_weights(jnp.asarray(cents), jnp.asarray(pts), True, 1.1)
    )
    want = _np_routing(cents, pts, True, 1.1)
    np.testing.assert_allclose(w, want, atol=1e-5)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_routing_hard_one_hot():
    cents = np.array([[0, 0, 0], [0, 1, 1]], np.float32)
    pts = np.array([[0, 0.1, 0.1], [0, 0.9, 0.9]], np.float32)
    w = np.asarray(cont.routing_weights(jnp.asarray(cents), jnp.asarray(pts), True, 1.0))
    np.testing.assert_allclose(w, [[1, 0], [0, 1]])


def test_container_forward_blend_and_active_module():
    cfg, vars_ = _toy_container()
    xd = jax.random.normal(jax.random.PRNGKey(2), (64, 6)) * 0.5
    y = cont.container_forward(vars_, cfg, xd)
    assert y.shape == (64, 4)

    # deep inside expert 0's cell the blend equals expert 0 alone
    x0 = jnp.concatenate(
        [jnp.tile(jnp.array([[0.0, -0.5, -0.5]]), (4, 1)),
         jax.random.normal(jax.random.PRNGKey(3), (4, 3))],
        axis=1,
    )
    y_blend = cont.container_forward(vars_, cfg, x0)
    y_only = cont.container_forward(vars_, cfg, x0, active_module=0)
    np.testing.assert_allclose(np.asarray(y_blend), np.asarray(y_only), atol=1e-5)


def test_container_density_matches_forward_sigma_componentwise():
    cfg, vars_ = _toy_container()
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (32, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
    xd = jnp.concatenate([xyz, d], axis=1)
    y = cont.container_forward(vars_, cfg, xd)
    sig = cont.container_density(vars_, cfg, xyz)
    np.testing.assert_allclose(np.asarray(y[:, 3]), np.asarray(sig), rtol=1e-5)


def test_background_color_range():
    cfg, vars_ = _toy_container()
    d = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    rgb = np.asarray(cont.background_color(vars_, cfg, d))
    assert rgb.shape == (16, 3)
    assert (rgb > 0).all() and (rgb < 1).all()


def test_param_group_labels_structure():
    cfg, vars_ = _toy_container()
    labels = cont.param_group_labels(vars_, cfg)
    flat_params = jax.tree.leaves(vars_["params"])
    flat_labels = jax.tree.leaves(labels)
    assert len(flat_params) == len(flat_labels)
    assert set(flat_labels) <= {"encoding", "sigma", "color", "background"}
