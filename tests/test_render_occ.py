"""Occupancy-guided rendering vs the stratified oracle on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.models.encodings import HashGridConfig
from acn_tpu.models.ngp import NGPConfig
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.nerfs.render import render_rays_stratified
from acn_tpu.nerfs.render_occ import render_expert_occ, render_rays_occ
from acn_tpu.occupancy import grid as og
from acn_tpu.occupancy.grid import OccConfig


def setup_scene(K=2):
    cfg = ContainerConfig(
        num_submodules=K,
        boundary_margin=1.1,
        cluster_2d=True,
        use_bg_nerf=False,
        expert=NGPConfig(
            hidden=16, color_hidden=16,
            hash=HashGridConfig(levels=2, min_res=4, max_res=16,
                                log2_hashmap_size=8, layout="cell"),
        ),
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]])[:K]
    boxes = jnp.stack([sbox.make_aabb([-1, -1, -1], [1, 1, 1])] * K)
    gaabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    variables = cont.init_container(jax.random.PRNGKey(0), cfg, cents, boxes, gaabb)
    occ_cfg = OccConfig(resolution=32, levels=1, cone_angle=0.0,
                        near_plane=0.0, far_plane=10.0, alpha_thre=0.0)

    # train-free scene: just mark everything occupied so occ == dense sampling
    def full_state(ab):
        st = og.init_occ_state(ab, occ_cfg)
        return {**st, "binaries": jnp.ones_like(st["binaries"])}

    occ_states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[full_state(b) for b in np.asarray(boxes)]
    )
    return cfg, variables, occ_cfg, occ_states


def rays_through(N=32, key=1):
    k = jax.random.PRNGKey(key)
    o = jnp.concatenate(
        [jax.random.uniform(k, (N, 2), minval=-0.5, maxval=0.5),
         jnp.full((N, 1), 2.0)], axis=1)
    d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N, 1))
    nf = jnp.concatenate([jnp.full((N, 1), 1.0), jnp.full((N, 1), 3.0)], axis=1)
    return jnp.concatenate([o, d, nf], axis=1)


def test_expert_occ_close_to_stratified():
    """With a fully-occupied grid and fine steps, occupancy rendering must
    approximate the stratified integral of the same field."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    rays = rays_through(16)
    occ0 = jax.tree.map(lambda a: a[0], occ_states)

    rgb_o, depth_o, _, acc_o = render_expert_occ(
        variables, occ0, cfg, occ_cfg, rays,
        active_module=0, s_max=512, s_kept=512,
    )

    model_fn = lambda xd: cont.container_forward(variables, cfg, xd, active_module=0)
    rgb_s, depth_s, _, acc_s = render_rays_stratified(model_fn, rays, 256)

    np.testing.assert_allclose(np.asarray(acc_o), np.asarray(acc_s), atol=0.05)
    np.testing.assert_allclose(np.asarray(rgb_o), np.asarray(rgb_s), atol=0.05)


def test_container_occ_matches_expert_when_single():
    """K=1 soft-MoE occ rendering == single-expert occ rendering."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    rays = rays_through(8)
    kwargs = dict(s_max=256, s_kept=160)
    rgb_c, _, _, acc_c = render_rays_occ(
        variables, occ_states, cfg, occ_cfg, rays, **kwargs
    )
    occ0 = jax.tree.map(lambda a: a[0], occ_states)
    rgb_e, _, _, acc_e = render_expert_occ(
        variables, occ0, cfg, occ_cfg, rays, active_module=0, **kwargs
    )
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_e), atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_c), np.asarray(acc_e), atol=1e-4)


def test_container_occ_soft_blend_two_experts():
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    rays = rays_through(16)
    rgb, depth, w, acc = render_rays_occ(
        variables, occ_states, cfg, occ_cfg, rays,
        s_max=256, s_kept=160,
    )
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.all(np.asarray(acc) >= 0) and np.all(np.asarray(acc) <= 1 + 1e-5)


def test_empty_occupancy_renders_background():
    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    empty = jax.tree.map(
        lambda a: jnp.zeros_like(a) if a.dtype == jnp.bool_ else a, occ_states
    )
    rays = rays_through(8)
    bg = jnp.full((8, 3), 0.7)
    rgb, depth, _, acc = render_rays_occ(
        variables, empty, cfg, occ_cfg, rays,
        s_max=128, s_kept=32, bg_rgb=bg,
    )
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), 0.7, atol=1e-6)


def test_occ_subsampled_matches_stratified():
    """Round-1 regression: with a diffuse (fully occupied) grid and s_kept far
    below the number of valid bins, even-stride compaction + dt scaling must
    still reproduce the stratified integral over the WHOLE ray — the old
    first-k compaction truncated coverage to the near end and tanked PSNR."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    rays = rays_through(16)
    occ0 = jax.tree.map(lambda a: a[0], occ_states)

    rgb_o, depth_o, _, acc_o = render_expert_occ(
        variables, occ0, cfg, occ_cfg, rays,
        active_module=0, s_max=512, s_kept=64,  # stride = 8
    )
    model_fn = lambda xd: cont.container_forward(variables, cfg, xd, active_module=0)
    rgb_s, depth_s, _, acc_s = render_rays_stratified(model_fn, rays, 256)

    np.testing.assert_allclose(np.asarray(acc_o), np.asarray(acc_s), atol=0.08)
    np.testing.assert_allclose(np.asarray(rgb_o), np.asarray(rgb_s), atol=0.08)


def test_budget_march_matches_per_ray_when_unconstrained():
    """With budget >= all valid samples, the global-budget render must equal
    the per-ray-layout render exactly (same bins, same field, no drops)."""
    import types

    from acn_tpu.occupancy import grid as occ_grid
    from acn_tpu.pipelines.offline_stage.train_step import make_episode_loss

    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    occ0 = jax.tree.map(lambda a: a[0], occ_states)
    rays = rays_through(16)
    rgbs = jnp.full((16, 3), 0.5)
    aabb = variables["buffers"]["expert_aabbs"][0]
    e0 = jax.tree.map(lambda a: a[0], variables["params"]["experts"])

    def P_for(budget):
        return types.SimpleNamespace(
            ray_samples=32, color_space="linear", bg_color_default="none",
            occ_s_max=64, occ_s_kept=64, occ_budget_per_ray=budget,
            use_amp=False, train_chunk_rays=0,
        )

    outs = {}
    for budget in (0, 64):  # 64 = s_max ⇒ budget can never drop a sample
        loss_fn, prep = make_episode_loss(cfg, P_for(budget), occ_cfg)
        smp = prep(occ0, rays, None)
        outs[budget] = float(
            loss_fn(e0, None, aabb, occ0, rays, rgbs,
                    jax.random.PRNGKey(0), samples=smp)
        )
    assert np.isfinite(outs[0]) and np.isfinite(outs[64])
    np.testing.assert_allclose(outs[64], outs[0], rtol=1e-5)


def test_budget_march_overflow_drops_tail():
    """An undersized budget reports overflow and still renders finitely."""
    from acn_tpu.occupancy import grid as occ_grid

    cfg, variables, occ_cfg, occ_states = setup_scene(K=1)
    occ0 = jax.tree.map(lambda a: a[0], occ_states)
    rays = rays_through(8)
    out = occ_grid.march_rays_budget(occ0, rays, occ_cfg, 64, 4)  # tiny budget
    assert float(out["overflow"]) > 0
    # every in-budget sample has a buffer slot < B
    B = out["xd"].shape[0]
    v = np.asarray(out["valid"])
    g = np.asarray(out["gpos"])
    assert (g[v] < B).all() and (g[v] >= 0).all()


def test_container_budget_matches_per_ray():
    """render_rays_occ_budget == render_rays_occ(s_kept=s_max) when the
    budget covers every valid sample (same bins, no drops, no stride)."""
    from acn_tpu.nerfs.render_occ import render_rays_occ_budget

    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    rays = rays_through(8)
    rgb_a, depth_a, _, acc_a = render_rays_occ(
        variables, occ_states, cfg, occ_cfg, rays, s_max=64, s_kept=64,
    )
    rgb_b, depth_b, _, acc_b = render_rays_occ_budget(
        variables, occ_states, cfg, occ_cfg, rays, s_max=64,
        budget_per_ray=64,
    )
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_b), np.asarray(acc_a), atol=1e-5)


def test_composite_packed_precision_at_scale():
    """Per-ray transmittance must not lose precision late in a large packed
    buffer. A global f32 log-cumsum accumulates ~23 per opaque sample; at
    B~1e5-1e6 its ulp swamps exp(ce-base) for late rays (up to tens of
    percent). The segmented scan bounds magnitude per ray, so weights match
    a float64 per-segment reference everywhere in the buffer."""
    from acn_tpu.nerfs.render import composite_packed

    rng = np.random.default_rng(7)
    n_rays, spr = 4096, 48  # B ≈ 200k packed samples
    B = n_rays * spr
    rid = np.repeat(np.arange(n_rays, dtype=np.int32), spr)
    ray_start = (np.arange(n_rays, dtype=np.int32) * spr)
    t0 = np.tile(np.linspace(1.0, 3.0, spr, dtype=np.float32), n_rays)
    t1 = t0 + 2.0 / spr
    # mostly-opaque scene: most samples have large sigma -> logT ~ -23 each,
    # a global prefix would reach ~ -2e6 by the end of the buffer
    sig = rng.uniform(300.0, 900.0, B).astype(np.float32)
    sig[rng.uniform(size=B) < 0.3] = rng.uniform(0.0, 3.0)
    rgb = rng.uniform(0, 1, (B, 3)).astype(np.float32)
    samples = {
        "t0_b": jnp.asarray(t0), "t1_b": jnp.asarray(t1),
        "ray_id": jnp.asarray(rid),
        "slot_real": jnp.ones((B,), bool),
        "ray_start": jnp.asarray(ray_start),
    }
    rgb_map, depth, acc, _ = composite_packed(
        jnp.asarray(sig), jnp.asarray(rgb), samples, n_rays)

    # float64 per-ray reference
    dt = (t1 - t0).astype(np.float64)
    alpha = 1.0 - np.exp(-sig.astype(np.float64) * dt)
    a2 = alpha.reshape(n_rays, spr)
    trans = np.cumprod(1.0 - a2 + 1e-10, axis=1)
    trans = np.concatenate([np.ones((n_rays, 1)), trans[:, :-1]], axis=1)
    w = (a2 * trans).reshape(B)
    ref_rgb = (w[:, None] * rgb).reshape(n_rays, spr, 3).sum(1)
    ref_acc = w.reshape(n_rays, spr).sum(1)

    np.testing.assert_allclose(np.asarray(acc), ref_acc, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb_map), ref_rgb, atol=5e-5)
    # the late-buffer rays specifically (where the old global prefix broke)
    np.testing.assert_allclose(
        np.asarray(rgb_map)[-64:], ref_rgb[-64:], atol=5e-5)
