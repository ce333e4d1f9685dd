import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.nerfs import rays as raylib
from acn_tpu.nerfs import render as rnd
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.nerfs.color import linear_to_srgb, srgb_to_linear
from acn_tpu.nerfs.losses import aligned_mse_loss, psnr, ssim
from acn_tpu.models.trunc_exp import trunc_exp


# ------------------------- ray generation -------------------------


def test_ray_directions_center_pixel_points_forward():
    H, W = 4, 6
    fx = fy = 10.0
    cx, cy = W / 2, H / 2
    dirs = raylib.get_ray_directions(H, W, fx, fy, cx, cy, center_pixels=False)
    assert dirs.shape == (H, W, 3)
    # principal-point pixel looks along -z in RUB camera frame
    d = np.asarray(dirs[int(cy), int(cx)])
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    # all unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1, atol=1e-5)
    # y decreases as j (row) increases: image down = camera -y (RUB)
    assert float(dirs[H - 1, int(cx), 1]) < float(dirs[0, int(cx), 1])


def test_get_rays_identity_pose_constant_near_far():
    H, W = 2, 3
    dirs = raylib.get_ray_directions(H, W, 5.0, 5.0, 1.5, 1.0, center_pixels=True)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [2.0], [3.0]])], axis=1)
    rays = raylib.get_rays(dirs, c2w, near=0.1, far=9.0)
    assert rays.shape == (H, W, 8)
    np.testing.assert_allclose(rays[..., :3], np.broadcast_to([1, 2, 3], (H, W, 3)))
    np.testing.assert_allclose(rays[..., 6], 0.1)
    np.testing.assert_allclose(rays[..., 7], 9.0)


def test_get_rays_rotated_pose():
    # 90° rotation around z: camera x → world y
    R = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    c2w = jnp.concatenate([R, jnp.zeros((3, 1))], axis=1)
    d_cam = jnp.array([[1.0, 0.0, 0.0]])
    rays = raylib.get_rays(d_cam, c2w, near=0.0, far=1.0)
    np.testing.assert_allclose(rays[0, 3:6], [0, 1, 0], atol=1e-6)


def test_get_rays_with_scene_box_near_far():
    aabb = sbox.make_aabb([0, -1, -1], [1, 1, 1])
    d_cam = jnp.array([[0.0, 0.0, -1.0]])  # looking along -z (camera forward)
    # camera at (0,0,2) with identity rotation: world dir = (0,0,-1)
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[0.5], [0.0], [2.0]])], axis=1)
    rays = raylib.get_rays(d_cam, c2w, aabb=aabb)
    np.testing.assert_allclose(rays[0, 6], 1.0, atol=1e-5)  # enters z=1 at t=1
    np.testing.assert_allclose(rays[0, 7], 3.0, atol=1e-5)  # exits z=-1 at t=3


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, (7, 8))
    o, d, n, f = raylib.unpack_rays(r)
    packed = raylib.pack_rays(o, d, n, f)
    np.testing.assert_allclose(packed, r)


def test_clamp_rays_near_far():
    rays = jnp.array(
        [
            [0, 0, 0, 1, 0, 0, 0.5, 2.0],
            [0, 0, 0, 1, 0, 0, 3.0, 2.0],  # inverted → invalid
        ],
        dtype=jnp.float32,
    )
    out, valid = raylib.clamp_rays_near_far(rays, (1.0, 1.5))
    assert list(np.asarray(valid)) == [True, False]
    np.testing.assert_allclose(out[0, 6:], [1.0, 1.5])
    assert not np.isfinite(np.asarray(out[1, 6:])).any()

    out2, valid2 = raylib.clamp_rays_near_far(rays, None)
    assert list(np.asarray(valid2)) == [True, False]
    np.testing.assert_allclose(out2, rays)


# ------------------------- volume rendering -------------------------


def test_volume_render_opaque_wall_closed_form():
    # Single homogeneous slab: σ constant, analytic opacity 1 - exp(-σ L)
    N, S = 4, 64
    sigma = 10.0
    t = jnp.linspace(0.0, 1.0, S)
    t_vals = jnp.broadcast_to(t, (N, S))
    rgb = jnp.ones((N, S, 3)) * 0.6
    rs = jnp.concatenate([rgb, jnp.full((N, S, 1), sigma)], axis=-1)
    rgb_map, depth, w, acc = rnd.volume_render(rs, t_vals)
    # Expected opacity of slab of length ~1 (+ last repeated Δ)
    L = float(t[1] - t[0]) * S
    expected_acc = 1 - np.exp(-sigma * L)
    np.testing.assert_allclose(acc, expected_acc, rtol=1e-2)
    np.testing.assert_allclose(rgb_map, 0.6 * expected_acc, rtol=1e-2)


def test_volume_render_empty_space_bg():
    N, S = 3, 8
    t_vals = jnp.broadcast_to(jnp.linspace(0, 1, S), (N, S))
    rs = jnp.zeros((N, S, 4))
    bg = jnp.ones((N, 3)) * 0.25
    rgb_map, depth, w, acc = rnd.volume_render(rs, t_vals, bg_rgb=bg)
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)
    np.testing.assert_allclose(rgb_map, 0.25, atol=1e-6)
    np.testing.assert_allclose(depth, 0.0, atol=1e-6)


def test_volume_render_weights_sum_le_one_and_mask():
    key = jax.random.PRNGKey(1)
    N, S = 16, 32
    t_vals = jnp.sort(jax.random.uniform(key, (N, S)), axis=1)
    rs = jax.random.uniform(key, (N, S, 4)) * jnp.array([1, 1, 1, 50.0])
    _, _, w, acc = rnd.volume_render(rs, t_vals)
    assert np.all(np.asarray(acc) <= 1.0 + 1e-5)
    # Full mask ≡ no mask
    m = jnp.ones((N, S), bool)
    _, _, w2, _ = rnd.volume_render(rs, t_vals, sample_mask=m)
    np.testing.assert_allclose(w, w2)
    # Zero mask ⇒ zero weights
    _, _, w3, acc3 = rnd.volume_render(rs, t_vals, sample_mask=jnp.zeros((N, S), bool))
    np.testing.assert_allclose(w3, 0.0, atol=1e-9)
    np.testing.assert_allclose(acc3, 0.0, atol=1e-9)


def test_render_weights_from_density_matches_volume_render():
    key = jax.random.PRNGKey(2)
    N, S = 8, 16
    t0 = jnp.sort(jax.random.uniform(key, (N, S)), axis=1)
    dt = 0.05
    t1 = t0 + dt
    sig = jax.random.uniform(jax.random.PRNGKey(3), (N, S)) * 20
    w, trans = rnd.render_weights_from_density(t0, t1, sig)
    alpha = 1 - np.exp(-np.asarray(sig) * dt)
    T = np.cumprod(1 - alpha + 1e-10, axis=1)
    T = np.concatenate([np.ones((N, 1)), T[:, :-1]], axis=1)
    np.testing.assert_allclose(w, alpha * T, rtol=1e-3, atol=1e-5)


def test_stratified_t_vals_bounds_and_monotonic():
    key = jax.random.PRNGKey(0)
    near = jnp.array([0.0, 1.0])
    far = jnp.array([1.0, 5.0])
    t = rnd.stratified_t_vals(key, near, far, 33, randomized=True)
    t_np = np.asarray(t)
    assert t_np.shape == (2, 33)
    assert np.all(np.diff(t_np, axis=1) >= 0)
    assert np.all(t_np[:, 0] >= np.asarray(near) - 1e-6)
    assert np.all(t_np[:, -1] <= np.asarray(far) + 1e-6)
    t_det = rnd.stratified_t_vals(None, near, far, 3, randomized=False)
    np.testing.assert_allclose(t_det[0], [0, 0.5, 1.0], atol=1e-6)


def test_render_rays_stratified_constant_field():
    def model_fn(xd):
        rgb = jnp.full((xd.shape[0], 3), 0.3)
        sig = jnp.full((xd.shape[0], 1), 100.0)  # opaque
        return jnp.concatenate([rgb, sig], axis=-1)

    rays = jnp.array([[0, 0, 0, 1, 0, 0, 0.1, 2.0]], dtype=jnp.float32)
    rgb, depth, w, acc = rnd.render_rays_stratified(model_fn, rays, 64)
    np.testing.assert_allclose(acc, 1.0, atol=1e-3)
    np.testing.assert_allclose(rgb, 0.3, atol=1e-3)
    assert 0.1 < float(depth[0]) < 0.3  # opaque ⇒ depth near entry


# ------------------------- color / losses / trunc_exp -------------------------


def test_srgb_roundtrip():
    x = jnp.linspace(0, 1, 256)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)
    # known anchor points
    np.testing.assert_allclose(linear_to_srgb(jnp.array(0.0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(linear_to_srgb(jnp.array(1.0)), 1.0, atol=1e-6)


def test_aligned_mse_and_psnr():
    gt_srgb = jnp.full((10, 3), 0.5)
    pred_lin = srgb_to_linear(gt_srgb)
    assert float(aligned_mse_loss(pred_lin, gt_srgb, "linear")) < 1e-10
    assert float(aligned_mse_loss(pred_lin, gt_srgb, "srgb")) < 1e-10
    p = psnr(jnp.zeros((4,)), jnp.full((4,), 0.1))
    np.testing.assert_allclose(p, 20.0, rtol=1e-5)


def test_ssim_identity_and_noise():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (32, 32, 3))
    assert float(ssim(img, img)) > 0.999
    noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
    assert float(ssim(img, noisy)) < 0.9


def test_ssim_stays_in_range_on_near_constant_pred():
    # regression: a near-constant prediction against a structured GT used to
    # read ±5 under low-precision conv accumulation (negative window
    # variances past the c2 stabilizer); SSIM is mathematically in [-1, 1]
    key = jax.random.PRNGKey(2)
    gt = (jax.random.uniform(key, (96, 128, 3)) > 0.5).astype(jnp.float32)
    pred = 0.5 + 0.02 * jax.random.uniform(jax.random.PRNGKey(3), gt.shape)
    v = float(ssim(pred, gt))
    assert -1.0 <= v <= 1.0
    # bf16 inputs (the AMP render path) must not degrade the accumulation
    v16 = float(ssim(pred.astype(jnp.bfloat16), gt.astype(jnp.bfloat16)))
    assert abs(v16 - v) < 0.05 and -1.0 <= v16 <= 1.0


def test_trunc_exp_value_and_grad():
    x = jnp.array([-1.0, 0.0, 1.0, 200.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(y[:3], np.exp([-1, 0, 1]), rtol=1e-6)
    assert np.isfinite(float(y[3]))  # clamped, no overflow
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    np.testing.assert_allclose(g[:3], np.exp([-1, 0, 1]), rtol=1e-6)
    assert np.isfinite(float(g[3]))
