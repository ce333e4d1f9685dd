"""Baked serving path: trilinear exactness, analytic compositing parity,
bake-vs-live container agreement, and the frame renderer (incl. mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.parallel.mesh import make_render_mesh
from acn_tpu.pipelines.baking import (
    BakedRenderer,
    bake_container,
    bake_field,
    render_baked_rays,
    trilinear_lookup,
)

from test_render_occ import setup_scene, rays_through

AABB = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)


def test_trilinear_lookup_reproduces_trilinear_field():
    """Trilinear interpolation is exact for functions of the form
    a + bx + cy + dz (+ cross terms): lookups anywhere must match."""
    R = 9
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")

    def f(x, y, z):
        return np.stack(
            [0.3 + 0.2 * x, 0.5 - 0.1 * y + 0.05 * x * y,
             0.2 + 0.3 * z, 1.0 + x + 0.5 * y * z], axis=-1)

    table = f(X, Y, Z).reshape(-1, 4)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.99, 0.99, (512, 3)).astype(np.float32)
    got = np.asarray(trilinear_lookup(
        jnp.asarray(table), jnp.asarray(AABB), R, jnp.asarray(pts)))
    want = f(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_baked_render_matches_closed_form():
    """Constant σ, constant rgb inside the whole AABB: the baked render must
    match the analytic transmittance integral."""
    sigma0, rgb0 = 1.5, np.array([0.8, 0.4, 0.2], np.float32)

    def field_fn(xd):
        m = xd.shape[0]
        return (jnp.full((m,), sigma0),
                jnp.broadcast_to(jnp.asarray(rgb0), (m, 3)))

    baked = bake_field(field_fn, AABB, 33, bake_dirs=2, chunk=4096,
                       occ_resolution=16)
    # rays straight through the box: enter at t=1, exit at t=3 (camera at
    # x=-2 looking +x)
    n = 8
    o = np.tile(np.array([-2.0, 0.0, 0.0], np.float32), (n, 1))
    o[:, 1] = np.linspace(-0.5, 0.5, n)
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    nf = np.tile(np.array([1.0, 3.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], axis=-1))
    bg = jnp.ones((n, 3), jnp.float32)
    # budget = s_max: every bin of this fully-occupied field gets a slot
    # (a smaller budget drops tail rays' samples by design)
    rgb, depth, _, acc = render_baked_rays(
        baked, rays, s_max=256, budget_per_ray=256, bg_rgb=bg)

    acc_true = 1.0 - np.exp(-sigma0 * 2.0)
    want = rgb0 * acc_true + 1.0 * (1.0 - acc_true)
    np.testing.assert_allclose(np.asarray(acc), acc_true, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(rgb), np.tile(want, (n, 1)), atol=0.01)


def test_baked_empty_space_is_culled_and_background():
    """A field with content only in a small blob: rays that miss it must
    march ~no samples (occupancy culling) and return pure background."""
    def field_fn(xd):
        x = xd[:, :3]
        inside = jnp.linalg.norm(x - jnp.asarray([0.0, 0.6, 0.6]), axis=-1) < 0.25
        return jnp.where(inside, 20.0, 0.0), jnp.full((xd.shape[0], 3), 0.5)

    baked = bake_field(field_fn, AABB, 33, bake_dirs=1, chunk=8192,
                       occ_resolution=16)
    bins = np.asarray(baked["occ_state"]["binaries"])
    assert 0 < bins.sum() < 0.3 * bins.size  # sparse, not empty

    n = 4
    o = np.tile(np.array([-2.0, -0.6, -0.6], np.float32), (n, 1))
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    nf = np.tile(np.array([1.0, 3.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], axis=-1))
    bg = jnp.ones((n, 3), jnp.float32)
    rgb, _, _, acc = render_baked_rays(baked, rays, s_max=64,
                                       budget_per_ray=32, bg_rgb=bg)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-5)


def test_bake_container_close_to_live_render():
    """Baking the trained container and rendering the bake tracks the live
    occ render (resolution + diffuse-average error only — the test scene's
    color head is direction-dependent, so tolerance is loose but bounded)."""
    from acn_tpu.nerfs.render_occ import render_rays_occ

    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    baked = bake_container(variables, cfg, aabb=AABB, resolution=48,
                           bake_dirs=4, chunk=16384, occ_resolution=16,
                           occ_thre=1e-4)
    rays = rays_through(16)
    bg = jnp.ones((rays.shape[0], 3), jnp.float32)
    rgb_live, _, _, acc_live = render_rays_occ(
        variables, occ_states, cfg, occ_cfg, rays, s_max=64, s_kept=64,
        bg_rgb=bg)
    rgb_bake, _, _, acc_bake = render_baked_rays(
        baked, rays, s_max=64, budget_per_ray=64, bg_rgb=bg)
    assert float(jnp.mean(jnp.abs(rgb_bake - rgb_live))) < 0.08
    assert float(jnp.mean(jnp.abs(acc_bake - acc_live))) < 0.08


def test_baked_frame_renderer_and_mesh_equivalence():
    def field_fn(xd):
        x = xd[:, :3]
        inside = jnp.linalg.norm(x, axis=-1) < 0.6
        rgb = jnp.stack([0.5 + 0.5 * x[:, 0], 0.5 + 0.5 * x[:, 1],
                         jnp.full_like(x[:, 0], 0.3)], axis=-1)
        return jnp.where(inside, 8.0, 0.0), jnp.clip(rgb, 0, 1)

    baked = bake_field(field_fn, AABB, 33, bake_dirs=1, chunk=8192,
                       occ_resolution=16)
    H = W = 40
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    c2w = np.array(
        [[0.0, 0.0, -1.0, -2.0],
         [0.0, 1.0, 0.0, 0.0],
         [1.0, 0.0, 0.0, 0.0]], np.float32)
    r = BakedRenderer(baked, s_max=64, budget_per_ray=24,
                      chunk_points=20_000)
    rgb, depth, acc = r.render_image(H=H, W=W, intrinsics=intr, c2w=c2w)
    assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
    assert acc.reshape(H, W)[H // 2, W // 2] > 0.9  # blob visible
    assert acc.reshape(H, W)[0, 0] < 0.1  # corner is background

    mesh = make_render_mesh(jax.devices()[:8])
    rgb_m, _, acc_m = r.render_image(H=H, W=W, intrinsics=intr, c2w=c2w,
                                     mesh=mesh)
    np.testing.assert_allclose(rgb_m, rgb, atol=1.5 / 255)
    np.testing.assert_allclose(acc_m, acc, atol=2e-3)


def test_baked_asset_roundtrip(tmp_path):
    from acn_tpu.pipelines.baking import load_baked, save_baked

    def field_fn(xd):
        return (jnp.full((xd.shape[0],), 2.0),
                jnp.full((xd.shape[0], 3), 0.25))

    baked = bake_field(field_fn, AABB, 17, bake_dirs=1, chunk=2048,
                       occ_resolution=16)
    p = tmp_path / "asset.npz"
    save_baked(p, baked)
    loaded = load_baked(p)
    np.testing.assert_array_equal(np.asarray(loaded["table"]),
                                  np.asarray(baked["table"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["occ_state"]["binaries"]),
        np.asarray(baked["occ_state"]["binaries"]))
    assert loaded["resolution"] == 17
    # identical render from the loaded asset
    rays = jnp.asarray(np.array(
        [[-2, 0, 0, 1, 0, 0, 1.0, 3.0]], np.float32))
    bg = jnp.ones((1, 3), jnp.float32)
    a = render_baked_rays(baked, rays, s_max=32, budget_per_ray=32, bg_rgb=bg)
    b = render_baked_rays(loaded, rays, s_max=32, budget_per_ray=32, bg_rgb=bg)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)


def test_zpair_lookup_matches_plain():
    """pack_zpairs + trilinear_lookup_zpair (4 gathered rows/sample) must
    reproduce the 8-row lookup exactly, and the frame renderer must be
    identical in both modes."""
    from acn_tpu.pipelines.baking import (
        pack_zpairs, trilinear_lookup_zpair)

    R = 11
    rng = np.random.default_rng(3)
    table = rng.uniform(0, 2, (R * R * R, 4)).astype(np.float32)
    t2 = pack_zpairs(jnp.asarray(table), R)
    pts = rng.uniform(-0.99, 0.99, (777, 3)).astype(np.float32)
    a = trilinear_lookup(jnp.asarray(table), jnp.asarray(AABB), R,
                         jnp.asarray(pts))
    b = trilinear_lookup_zpair(t2, jnp.asarray(AABB), R, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)

    def field_fn(xd):
        x = xd[:, :3]
        inside = jnp.linalg.norm(x, axis=-1) < 0.6
        return jnp.where(inside, 5.0, 0.0), jnp.full((xd.shape[0], 3), 0.4)

    baked = bake_field(field_fn, AABB, 17, bake_dirs=1, chunk=2048,
                       occ_resolution=16)
    H = W = 24
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    c2w = np.array(
        [[0.0, 0.0, -1.0, -2.0],
         [0.0, 1.0, 0.0, 0.0],
         [1.0, 0.0, 0.0, 0.0]], np.float32)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=c2w)
    r_plain = BakedRenderer(baked, s_max=32, budget_per_ray=16,
                            chunk_points=8192, zpair=False)
    r_z = BakedRenderer(baked, s_max=32, budget_per_ray=16,
                        chunk_points=8192, zpair=True)
    rgb_a, _, acc_a = r_plain.render_image(**kw)
    rgb_b, _, acc_b = r_z.render_image(**kw)
    np.testing.assert_allclose(rgb_b, rgb_a, atol=1.5 / 255)
    np.testing.assert_allclose(acc_b, acc_a, atol=1e-3)


# ---------------------------- SH-1 view dependence ----------------------------


def test_sh1_bake_reproduces_direction_linear_field():
    """SH-1 spans exactly {constant + linear-in-direction}: baking
    rgb(x, d) = 0.5 + [0.2, -0.15, 0.1]·d-components must reproduce the
    field at lattice points for arbitrary view directions."""
    from acn_tpu.pipelines.baking import decode_sh1, trilinear_lookup

    slope = np.array([0.2, -0.15, 0.1], np.float32)

    def field_fn(xd):
        d = xd[:, 3:6]
        rgb = 0.5 + d * slope[None, :]  # stays inside [0, 1]
        return jnp.full((xd.shape[0],), 1.0), rgb

    baked = bake_field(field_fn, AABB, 9, bake_dirs=8, chunk=512,
                       occ_resolution=8, sh_degree=1)
    assert baked["sh_degree"] == 1
    assert baked["table"].shape[-1] == 13

    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    v = trilinear_lookup(baked["table"], jnp.asarray(AABB), 9,
                         jnp.asarray(pts))
    got = np.asarray(decode_sh1(v[:, :12], jnp.asarray(dirs)))
    want = 0.5 + dirs * slope[None, :]
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v[:, -1]), 1.0, atol=1e-5)


def test_sh1_matches_sh0_on_matte_field():
    """For a direction-independent field the SH-1 bake must render
    identically to the diffuse bake (same marching, same σ, c1* ≈ 0)."""
    def field_fn(xd):
        x = xd[:, :3]
        sig = jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 3.0, 0.0)
        rgb = jnp.stack([0.2 + 0.3 * x[:, 0] ** 2,
                         jnp.full_like(x[:, 0], 0.6),
                         0.5 - 0.2 * x[:, 2]], axis=-1)
        return sig, jnp.clip(rgb, 0.0, 1.0)

    kw = dict(bake_dirs=8, chunk=8192, occ_resolution=16, occ_thre=1e-4)
    b0 = bake_field(field_fn, AABB, 33, sh_degree=0, **kw)
    b1 = bake_field(field_fn, AABB, 33, sh_degree=1, **kw)

    n = 6
    o = np.tile(np.array([-2.0, 0.0, 0.0], np.float32), (n, 1))
    o[:, 1] = np.linspace(-0.4, 0.4, n)
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n, 1))
    nf = np.tile(np.array([1.0, 3.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], axis=-1))
    bg = jnp.ones((n, 3), jnp.float32)
    r0 = render_baked_rays(b0, rays, s_max=64, budget_per_ray=32, bg_rgb=bg)
    r1 = render_baked_rays(b1, rays, s_max=64, budget_per_ray=32, bg_rgb=bg)
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r0[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(r1[3]), np.asarray(r0[3]),
                               atol=1e-4)


def test_sh1_roundtrip_and_frame_renderer():
    """save/load preserves sh_degree; BakedRenderer (z-pair packed 26-ch
    rows) renders the SH-1 asset identically to render_baked_rays math."""
    import pathlib
    import tempfile

    from acn_tpu.pipelines.baking import load_baked, save_baked

    def field_fn(xd):
        x, d = xd[:, :3], xd[:, 3:6]
        sig = jnp.where(jnp.abs(x).max(axis=-1) < 0.6, 2.0, 0.0)
        rgb = jnp.clip(0.5 + 0.2 * d, 0.0, 1.0)
        return sig, rgb

    baked = bake_field(field_fn, AABB, 17, bake_dirs=8, chunk=2048,
                       occ_resolution=8, occ_thre=1e-4, sh_degree=1)
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "b.npz"
        save_baked(p, baked)
        loaded = load_baked(p)
    assert loaded["sh_degree"] == 1

    H = W = 12
    intr = np.array([0.8 * H, 0.8 * H, W / 2, H / 2], np.float32)
    c2w = np.array([[0.0, 0.0, -1.0, -2.0],
                    [0.0, 1.0, 0.0, 0.0],
                    [1.0, 0.0, 0.0, 0.0]], np.float32)
    r_plain = BakedRenderer(loaded, s_max=32, budget_per_ray=16,
                            chunk_points=4096, zpair=False)
    r_z = BakedRenderer(loaded, s_max=32, budget_per_ray=16,
                        chunk_points=4096, zpair=True)
    img_p, _, acc_p = r_plain.render_image(H=H, W=W, intrinsics=intr, c2w=c2w)
    img_z, _, acc_z = r_z.render_image(H=H, W=W, intrinsics=intr, c2w=c2w)
    assert np.isfinite(img_p).all()
    assert acc_p.max() > 0.5  # the box is actually hit
    np.testing.assert_allclose(img_z, img_p, atol=2.5 / 255)


def test_supersampled_bake_matches_on_linear_field():
    """The voxel-average of a field that is LINEAR in position equals its
    center value — so a supersampled bake of such a field must match the
    point-sampled bake exactly; and supersampling composes with SH-1."""
    def field_fn(xd):
        x, d = xd[:, :3], xd[:, 3:6]
        sig = 1.0 + 0.5 * x[:, 0]
        rgb = jnp.clip(0.5 + 0.1 * x + 0.1 * d, 0.0, 1.0)
        return sig, rgb

    kw = dict(bake_dirs=8, chunk=1024, occ_resolution=8)
    b1 = bake_field(field_fn, AABB, 9, supersample=1, **kw)
    b2 = bake_field(field_fn, AABB, 9, supersample=2, **kw)
    np.testing.assert_allclose(np.asarray(b2["table"]),
                               np.asarray(b1["table"]), atol=3e-6)

    s1 = bake_field(field_fn, AABB, 9, supersample=1, sh_degree=1, **kw)
    s2 = bake_field(field_fn, AABB, 9, supersample=3, sh_degree=1, **kw)
    assert s2["table"].shape == s1["table"].shape == (9 ** 3, 13)
    np.testing.assert_allclose(np.asarray(s2["table"]),
                               np.asarray(s1["table"]), atol=3e-6)
