import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.occupancy import grid as og
from acn_tpu.occupancy.grid import OccConfig

CFG = OccConfig(resolution=16, levels=2, occ_thre=1e-2, warmup_steps=4)
AABB = sbox.make_aabb([-1, -1, -1], [1, 1, 1])


def test_level_aabbs_doubling():
    la = og.level_aabbs(AABB, 3)
    np.testing.assert_allclose(la[0], AABB)
    np.testing.assert_allclose(la[1], [[-2, -2, -2], [2, 2, 2]])
    np.testing.assert_allclose(la[2], [[-4, -4, -4], [4, 4, 4]])


def test_update_occ_grid_sphere_density():
    """A density field occupying a ball ⇒ binaries on inside, off far outside."""
    state = og.init_occ_state(AABB, CFG)

    def density_fn(x):  # σ=50 inside radius 0.5 ball
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where(r < 0.5, 50.0, 0.0)

    step_size = CFG.step_size_for(AABB)
    state = og.update_occ_grid(state, jax.random.PRNGKey(0), density_fn, CFG, step_size)

    # center cell occupied; corner of level-0 empty
    occ_center = og.occupancy_lookup(state, jnp.array([[0.0, 0.0, 0.0]]))
    occ_corner = og.occupancy_lookup(state, jnp.array([[0.9, 0.9, 0.9]]))
    assert bool(occ_center[0])
    assert not bool(occ_corner[0])
    # outside all levels → False
    occ_far = og.occupancy_lookup(state, jnp.array([[100.0, 0.0, 0.0]]))
    assert not bool(occ_far[0])


def test_ema_decay_drains_empty_cells():
    state = og.init_occ_state(AABB, CFG)
    dense = lambda x: jnp.full(x.shape[:-1], 100.0)
    empty = lambda x: jnp.zeros(x.shape[:-1])
    ss = CFG.step_size_for(AABB)
    state = og.update_occ_grid(state, jax.random.PRNGKey(0), dense, CFG, ss)
    assert bool(og.occupancy_lookup(state, jnp.zeros((1, 3)))[0])
    upd = jax.jit(lambda s, k: og.update_occ_grid(s, k, empty, CFG, ss))
    for i in range(280):  # decay below the 1e-6 threshold floor
        state = upd(state, jax.random.PRNGKey(i))
    assert not bool(og.occupancy_lookup(state, jnp.zeros((1, 3)))[0])


def test_mark_invisible_cells():
    state = og.init_occ_state(AABB, CFG)
    # one camera at (0,0,5) in RDF looking along −z world (toward origin):
    # cam axes: x→world x, y→world −y, z(forward)→world −z
    R = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    c2w = jnp.concatenate([R, jnp.array([[0.0], [0.0], [5.0]])], axis=1)[None]
    # narrow fov (fx=500, 128px) ⇒ half-angle ≈ 7.3°: corners fall outside
    K = jnp.array([[[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]]])
    state2 = og.mark_invisible_cells(state, K, c2w, 128, 128, 0.1, CFG)
    occs = np.asarray(state2["occs"])
    assert (occs < 0).any() and (occs >= 0).any()
    # cells directly in front of the camera (origin) remain visible
    # find level-0 center cell
    R_ = CFG.resolution
    c = occs[0, R_ // 2, R_ // 2, R_ // 2]
    assert c >= 0
    # invisible cells never turn on
    dense = lambda x: jnp.full(x.shape[:-1], 100.0)
    state3 = og.update_occ_grid(
        state2, jax.random.PRNGKey(0), dense, CFG, CFG.step_size_for(AABB)
    )
    bins = np.asarray(state3["binaries"]).reshape(-1)
    occ_flags = np.asarray(state3["occs"]).reshape(-1)
    assert not bins[occ_flags < 0].any()


def test_march_t_schedule_linear():
    near = jnp.array([1.0])
    far = jnp.array([2.0])
    t0, t1 = og.march_t_schedule(near, far, 0.1, 0.0, 16)
    np.testing.assert_allclose(t0[0, :5], [1.0, 1.1, 1.2, 1.3, 1.4], rtol=1e-5)
    np.testing.assert_allclose((t1 - t0)[0, :5], 0.1, rtol=1e-5)
    # clamped past far → zero length
    assert float((t1 - t0)[0, -1]) == 0.0


def test_march_t_schedule_cone_growth():
    near = jnp.array([0.01])
    far = jnp.array([100.0])
    t0, t1 = og.march_t_schedule(near, far, 0.01, 0.01, 512)
    dt = np.asarray(t1 - t0)[0]
    t0n = np.asarray(t0)[0]
    # monotone t, step ≈ max(Δ, c·t)
    assert np.all(np.diff(t0n) > 0)
    np.testing.assert_allclose(dt, np.maximum(0.01, 0.01 * t0n), rtol=1e-4)


def test_compact_samples():
    valid = jnp.array([[False, True, False, True, True], [False] * 5])
    idx, mask = og.compact_samples(valid, 3)
    np.testing.assert_array_equal(idx[0], [1, 3, 4])
    np.testing.assert_array_equal(mask[0], [True, True, True])
    assert not bool(mask[1].any())


def test_compact_samples_strided_keep_all():
    """n_valid <= s_kept ⇒ identical to first-k compaction, scale 1."""
    valid = jnp.array([[False, True, False, True, True], [False] * 5])
    idx, mask, scale = og.compact_samples_strided(valid, 3)
    np.testing.assert_array_equal(idx[0], [1, 3, 4])
    np.testing.assert_array_equal(mask[0], [True, True, True])
    assert not bool(mask[1].any())
    np.testing.assert_allclose(scale, [1.0, 1.0])


def test_compact_samples_strided_subsamples_evenly():
    """n_valid > s_kept ⇒ every stride-th valid sample across the FULL valid
    extent (no truncation to the near end), dt scale = stride."""
    valid = jnp.ones((1, 12), bool)
    idx, mask, scale = og.compact_samples_strided(valid, 4)
    np.testing.assert_array_equal(idx[0], [0, 3, 6, 9])  # stride ceil(12/4)=3
    assert bool(mask[0].all())
    np.testing.assert_allclose(scale, [3.0])

    # sparse validity: ranks map through the valid subsequence
    valid = jnp.array([[True, False, True, True, False, True, True, True]])
    idx, mask, scale = og.compact_samples_strided(valid, 3)  # n_valid=6, stride 2
    np.testing.assert_array_equal(idx[0], [0, 3, 6])
    np.testing.assert_array_equal(mask[0], [True, True, True])
    np.testing.assert_allclose(scale, [2.0])


def test_compact_samples_strided_random_phase_covers_extent():
    valid = jnp.ones((4, 100), bool)
    idx, mask, scale = og.compact_samples_strided(
        valid, 10, key=jax.random.PRNGKey(0)
    )
    assert np.asarray(mask).sum(axis=1).min() >= 9  # phase can drop ≤1 slot
    np.testing.assert_allclose(scale, 10.0)
    # kept indices span the whole extent, not just the first 10
    assert np.asarray(idx).max() > 80


def test_march_rays_end_to_end_sphere():
    cfg = OccConfig(resolution=32, levels=1, cone_angle=0.0, near_plane=0.0)
    state = og.init_occ_state(AABB, cfg)
    density_fn = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 0.3, 100.0, 0.0)
    ss = cfg.step_size_for(AABB)
    state = og.update_occ_grid(state, jax.random.PRNGKey(0), density_fn, cfg, ss)

    rays = jnp.array([[-2, 0, 0, 1, 0, 0, 0.0, 4.0]], dtype=jnp.float32)
    out = og.march_rays(state, rays, cfg, s_max=1024, s_kept=128)
    mask = np.asarray(out["mask"])[0]
    assert mask.any()
    # all kept samples lie near the occupied ball (within a cell diagonal)
    pts = np.asarray(out["positions"])[0][mask]
    r = np.linalg.norm(pts, axis=-1)
    assert (r < 0.3 + 2 * (2.0 / 32) * np.sqrt(3)).all()
    # t sorted
    t0 = np.asarray(out["t_starts"])[0][mask]
    assert np.all(np.diff(t0) >= 0)


def test_march_rays_full_coverage_when_diffuse():
    """A fully-occupied (diffuse) grid must NOT truncate ray coverage: kept
    samples span the whole [near, far], with dt scaled by the stride so the
    total covered length is preserved (this was round 1's PSNR cliff)."""
    cfg = OccConfig(resolution=16, levels=1, cone_angle=0.0, near_plane=0.0)
    state = og.init_occ_state(AABB, cfg)
    dense = lambda x: jnp.full(x.shape[:-1], 100.0)
    state = og.update_occ_grid(
        state, jax.random.PRNGKey(0), dense, cfg, cfg.step_size_for(AABB)
    )
    rays = jnp.array([[-1, 0, 0, 1, 0, 0, 0.0, 2.0]], dtype=jnp.float32)
    out = og.march_rays(state, rays, cfg, s_max=256, s_kept=32)
    mask = np.asarray(out["mask"])[0]
    assert mask.all()
    t0 = np.asarray(out["t_starts"])[0]
    # coverage reaches the far end of the ray (not the first 32 bins)
    assert t0[-1] > 1.7
    # scaled dts integrate to ~the full ray extent
    dts = np.asarray(out["dts"])[0]
    np.testing.assert_allclose(dts.sum(), 2.0, rtol=0.05)


def test_coarse_ray_range_is_conservative():
    """Property: every occupied fine bin of the untightened march lies
    inside the tightened [near', far'] — random sparse grids, random rays."""
    rng = np.random.default_rng(7)
    cfg = OccConfig(resolution=32, levels=1, cone_angle=0.0, near_plane=0.0)
    for trial in range(4):
        state = og.init_occ_state(AABB, cfg)
        # a few random occupied blobs
        bins = np.zeros((1, 32, 32, 32), bool)
        for _ in range(3):
            c = rng.integers(4, 28, 3)
            r = rng.integers(1, 4)
            sl = tuple(slice(int(a - r), int(a + r)) for a in c)
            bins[(0, *sl)] = True
        state = {**state, "binaries": jnp.asarray(bins)}

        n = 64
        # long-range trial: origins far out, range many times the AABB —
        # the nasty case for probe-vs-crossing distance in the pre-pass
        spread = 3.0 if trial % 2 == 0 else 8.0
        o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
        tgt = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        near = np.full((n,), 0.1, np.float32)
        far = np.full((n,), 8.0 if trial % 2 == 0 else 20.0, np.float32)

        near2, far2 = og.coarse_ray_range(
            state, jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
            jnp.asarray(far), s_coarse=32)
        near2, far2 = np.asarray(near2), np.asarray(far2)
        assert (near2 >= near - 1e-5).all() and (far2 <= far + 1e-5).all()

        # brute-force fine reference: dense samples along the full range
        s_fine = 512
        t = near[:, None] + (far - near)[:, None] * (
            (np.arange(s_fine) + 0.5) / s_fine)[None, :]
        x = o[:, None] + d[:, None] * t[..., None]
        occ = np.asarray(og.occupancy_lookup(state, jnp.asarray(x)))
        covered = (t >= near2[:, None] - 1e-5) & (t <= far2[:, None] + 1e-5)
        missed = occ & ~covered
        assert not missed.any(), (
            f"trial {trial}: {missed.sum()} occupied samples outside the "
            "tightened range")


def test_march_budget_coarse_range_matches_render():
    """Rendering through the tightened range reproduces the closed-form
    integral of a constant-σ slab (content in a fraction of the ray span —
    exactly the case the range-finder accelerates)."""
    from acn_tpu.nerfs.render import composite_packed

    cfg = OccConfig(resolution=32, levels=1, cone_angle=0.0, near_plane=0.0)
    state = og.init_occ_state(AABB, cfg)
    bins = np.zeros((1, 32, 32, 32), bool)
    bins[0, :, :, 12:20] = True  # slab: z in [-0.25, 0.25]
    state = {**state, "binaries": jnp.asarray(bins)}

    n = 16
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    o[:, 0] = np.linspace(-0.5, 0.5, n)
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    nf = np.tile(np.array([0.1, 12.0], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([o, d, nf], axis=-1))

    sigma0, rgb0 = 2.0, np.array([0.9, 0.5, 0.1], np.float32)

    def render(s_max, s_coarse):
        s = og.march_rays_budget(state, rays, cfg, s_max, s_max,
                                 s_coarse=s_coarse)
        m = s["xd"].shape[0]
        rgb, _, acc, _ = composite_packed(
            jnp.full((m,), sigma0), jnp.tile(jnp.asarray(rgb0), (m, 1)), s,
            n, bg_rgb=jnp.ones((n, 3), jnp.float32))
        return np.asarray(rgb), np.asarray(acc)

    # slab span (+dilation) is ~1/12 of the 12-unit ray range: 48 coarse-
    # ranged fine bins sample it as densely as ~512 full-range bins
    rgb_c, acc_c = render(48, 32)
    acc_true = 1.0 - np.exp(-sigma0 * 0.5)  # slab thickness 0.5 (+ dilation
    # pads the range, not the occupied bins)
    want = rgb0 * acc_true + 1.0 * (1.0 - acc_true)
    np.testing.assert_allclose(acc_c, acc_true, atol=0.06)
    np.testing.assert_allclose(rgb_c, np.tile(want, (n, 1)), atol=0.05)

    # fully-occupied box: the pre-pass tightens [0.1, 12] to the box span
    # (t ∈ [3, 5] ± padding) so the same bin count lands MORE samples in
    # content — and the render still matches the closed form (box depth 2)
    state_full = {**state, "binaries": jnp.ones((1, 32, 32, 32), bool)}

    def render_full(s_max, s_coarse):
        s = og.march_rays_budget(state_full, rays, cfg, s_max, s_max,
                                 s_coarse=s_coarse)
        m = s["xd"].shape[0]
        _, _, acc, _ = composite_packed(
            jnp.full((m,), sigma0), jnp.tile(jnp.asarray(rgb0), (m, 1)), s,
            n, bg_rgb=jnp.ones((n, 3), jnp.float32))
        return np.asarray(acc), np.asarray(s["slot_real"]).mean()

    acc_plain, frac_plain = render_full(256, 0)
    acc_rngd, frac_rngd = render_full(64, 32)
    acc_box = 1.0 - np.exp(-sigma0 * 2.0)
    np.testing.assert_allclose(acc_plain, acc_box, atol=0.03)
    np.testing.assert_allclose(acc_rngd, acc_box, atol=0.03)
    assert frac_rngd > 2.0 * frac_plain  # 4x fewer bins, denser in content


def test_march_rays_report_budget_matches_budget_overflow():
    """march_rays(report_budget=b)['overflow'] must equal the drop fraction
    march_rays_budget actually realizes at budget b on the same batch (the
    auto-regime controller's safety signal). key=None pins both paths to
    deterministic bin midpoints, so the validity sets are identical."""
    cfg = OccConfig(resolution=16, levels=1, cone_angle=0.0, near_plane=0.0)
    state = og.init_occ_state(AABB, cfg)
    dense = lambda x: jnp.full(x.shape[:-1], 100.0)
    state = og.update_occ_grid(
        state, jax.random.PRNGKey(0), dense, cfg, cfg.step_size_for(AABB)
    )
    rays = jnp.stack(
        [
            jnp.array([-1, 0, 0, 1, 0, 0, 0.0, 2.0], jnp.float32),
            jnp.array([0, -1, 0, 0, 1, 0, 0.0, 2.0], jnp.float32),
            jnp.array([0, 0, -1, 0, 0, 1, 0.0, 2.0], jnp.float32),
        ]
    )
    for b in (4, 16, 64):
        est = og.march_rays(
            state, rays, cfg, s_max=64, s_kept=16, key=None, report_budget=b
        )["overflow"]
        real = og.march_rays_budget(state, rays, cfg, s_max=64,
                                    budget_per_ray=b, key=None)["overflow"]
        np.testing.assert_allclose(float(est), float(real), atol=1e-7)
    # dense grid, 64 valid bins/ray, budget 4 ⇒ heavy overflow must register
    est4 = og.march_rays(
        state, rays, cfg, s_max=64, s_kept=16, key=None, report_budget=4
    )["overflow"]
    assert float(est4) > 0.9
    # without report_budget the strided dict must NOT carry an overflow key
    # (the trainer would misread a would-be metric as actual drops)
    assert "overflow" not in og.march_rays(
        state, rays, cfg, s_max=64, s_kept=16, key=None
    )


def test_auto_regime_controller():
    from acn_tpu.pipelines.offline_stage.trainer import AutoRegime

    c = AutoRegime(thresh=0.02, patience=3)
    # above threshold: never arms
    assert not any(c.observe(0.5) for _ in range(5))
    # streak must be CONSECUTIVE: a spike resets it
    assert not c.observe(0.01)
    assert not c.observe(0.0)
    assert not c.observe(0.3)   # reset
    assert not c.observe(0.01)
    assert not c.observe(0.01)
    assert c.observe(0.0)        # third consecutive → fires exactly once
    assert c.switched
    assert not c.observe(0.0)    # never fires again
