"""Routed (per-expert image-rect) frame rendering vs the soft-MoE path.

With identical expert parameters and shared AABBs the soft-MoE blend
degenerates to any single expert's field, so the routed dispatch must
reproduce the soft frame exactly (up to u8 quantization). With genuine
quadrant AABBs the rects must crop and still cover the frame.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models import container as cont
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.occupancy import grid as og
from acn_tpu.pipelines.renderer import Renderer

from test_render_occ import setup_scene


def _renderer(cfg, occ_cfg, budget=0):
    P = types.SimpleNamespace(
        ray_samples=32, chunk_points=60_000, bg_color_default="white",
        occ_s_max=64, occ_s_kept=32, use_amp=False,
        occ_budget_per_ray=budget,
    )
    return Renderer(cfg, P, occ_cfg)


CAM = np.array(  # overhead at x=-2 looking down (+x is Down in DRB)
    [[0.0, 0.0, -1.0, -2.0],
     [0.0, 1.0, 0.0, 0.0],
     [1.0, 0.0, 0.0, 0.0]], np.float32
)


def _tie_experts(variables):
    """All experts share expert 0's parameters."""
    v = jax.tree.map(lambda a: a, variables)
    v["params"] = dict(v["params"])
    v["params"]["experts"] = jax.tree.map(
        lambda a: jnp.repeat(a[:1], a.shape[0], axis=0),
        variables["params"]["experts"],
    )
    return v


def test_routed_matches_soft_when_experts_identical():
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    variables = _tie_experts(variables)
    H = W = 40
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    for use_occ in (True, False):
        r = _renderer(cfg, occ_cfg)
        kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb,
                  use_occ=use_occ)
        rgb_s, dep_s, acc_s = r.render_image(variables, occ_states, **kw)
        rgb_r, dep_r, acc_r = r.render_image_routed(
            variables, occ_states, **kw
        )
        np.testing.assert_allclose(rgb_r, rgb_s, atol=0.02)
        np.testing.assert_allclose(acc_r, acc_s, atol=0.02)


def test_routed_budget_path_matches_soft_when_experts_identical():
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    variables = _tie_experts(variables)
    H = W = 32
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    r_soft = _renderer(cfg, occ_cfg, budget=0)
    r_budget = _renderer(cfg, occ_cfg, budget=48)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=True)
    rgb_s, _, acc_s = r_soft.render_image(variables, occ_states, **kw)
    rgb_b, _, acc_b = r_budget.render_image_routed(variables, occ_states, **kw)
    # different quadratures of the same fully-occupied field
    np.testing.assert_allclose(rgb_b, rgb_s, atol=0.06)
    np.testing.assert_allclose(acc_b, acc_s, atol=0.06)


def _quadrant_scene():
    from acn_tpu.models.container import ContainerConfig
    from acn_tpu.models.encodings import HashGridConfig
    from acn_tpu.models.ngp import NGPConfig
    from acn_tpu.occupancy.grid import OccConfig

    K = 4
    cfg = ContainerConfig(
        num_submodules=K, boundary_margin=1.1, cluster_2d=True,
        use_bg_nerf=False,
        expert=NGPConfig(
            hidden=16, color_hidden=16,
            hash=HashGridConfig(levels=2, min_res=4, max_res=16,
                                log2_hashmap_size=8, layout="cell"),
        ),
    )
    cents, boxes = [], []
    for iy in (-1, 1):
        for iz in (-1, 1):
            cents.append([0.0, 0.55 * iy, 0.55 * iz])
            lo = [-1.0, min(0.1 * iy, iy * 1.0), min(0.1 * iz, iz * 1.0)]
            hi = [1.0, max(0.1 * iy, iy * 1.0), max(0.1 * iz, iz * 1.0)]
            boxes.append(sbox.make_aabb(lo, hi))
    cents = jnp.asarray(cents)
    boxes = jnp.stack(boxes)
    gaabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    variables = cont.init_container(jax.random.PRNGKey(0), cfg, cents, boxes,
                                    gaabb)
    occ_cfg = OccConfig(resolution=16, levels=1, cone_angle=0.0,
                        near_plane=0.0, far_plane=10.0, alpha_thre=0.0)

    def full_state(ab):
        st = og.init_occ_state(ab, occ_cfg)
        return {**st, "binaries": jnp.ones_like(st["binaries"])}

    occ_states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[full_state(b) for b in np.asarray(boxes)]
    )
    return cfg, variables, occ_cfg, occ_states


def test_quadrant_rects_crop_and_cover():
    cfg, variables, occ_cfg, occ_states = _quadrant_scene()
    H = W = 64
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabbs = np.asarray(variables["buffers"]["expert_aabbs"])
    rects = Renderer._expert_rects(aabbs, CAM, intr, H, W, pad_px=2)
    # every quadrant AABB projects to a strict sub-rect...
    areas = (rects[:, 1] - rects[:, 0]) * (rects[:, 3] - rects[:, 2])
    assert (areas < H * W).all(), rects
    # ...and the union covers the scene's footprint in the image
    cover = np.zeros((H, W), bool)
    for r0, r1, c0, c1 in rects:
        cover[r0:r1, c0:c1] = True
    full = Renderer._expert_rects(
        np.array([[[-1, -1, -1], [1, 1, 1]]], np.float32), CAM, intr, H, W,
        pad_px=0,
    )[0]
    assert cover[full[0]:full[1], full[2]:full[3]].all()

    r = _renderer(cfg, occ_cfg)
    rgb, dep, acc = r.render_image_routed(
        variables, occ_states, H=H, W=W, intrinsics=intr, c2w=CAM,
        aabb=np.array([[-1, -1, -1], [1, 1, 1]], np.float32), use_occ=True,
    )
    assert np.isfinite(rgb).all() and np.isfinite(acc).all()
    assert rgb.shape == (H, W, 3)


def test_rects_full_frame_when_camera_inside():
    aabbs = np.array([[[-1, -1, -1], [1, 1, 1]]], np.float32)
    cam_inside = np.array(
        [[0.0, 0.0, -1.0, 0.0],
         [0.0, 1.0, 0.0, 0.0],
         [1.0, 0.0, 0.0, 0.0]], np.float32
    )
    H = W = 32
    intr = np.array([24.0, 24.0, 16.0, 16.0], np.float32)
    rects = Renderer._expert_rects(aabbs, cam_inside, intr, H, W, pad_px=0)
    assert tuple(rects[0]) == (0, H, 0, W)


def test_quadrant_routed_matches_soft_with_background():
    """Parity on a scene with UNCOVERED pixels (sky/horizon): the fallback
    full-frame rect must not wash other quadrants' content toward
    background (the expert rendering off-region sees acc~0 there, so its
    feather-only weight used to blend ~50/50 with real content)."""
    cfg, variables, occ_cfg, occ_states = _quadrant_scene()
    variables = _tie_experts(variables)
    H = W = 64
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    r = _renderer(cfg, occ_cfg)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=True)
    rgb_s, _, acc_s = r.render_image(variables, occ_states, **kw)
    rgb_r, _, acc_r = r.render_image_routed(variables, occ_states, **kw)
    # border pixels are genuinely uncovered (acc ~ 0 in the soft path)
    assert (np.asarray(acc_s).reshape(H, W)[0] < 0.05).any()
    np.testing.assert_allclose(rgb_r, rgb_s, atol=0.04)
    np.testing.assert_allclose(
        acc_r.reshape(H, W), np.asarray(acc_s).reshape(H, W), atol=0.04)


def test_routed_budget_with_coarse_range_matches_plain():
    """--occ_render_s_coarse wiring: the routed budget path with the
    range-finding pre-pass stays close to the same path without it (same
    field, different quadrature of the same occupied span)."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    variables = _tie_experts(variables)
    H = W = 32
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    r_plain = _renderer(cfg, occ_cfg, budget=48)
    P_c = types.SimpleNamespace(**{**vars(r_plain.P), "occ_render_s_coarse": 16})
    r_coarse = Renderer(cfg, P_c, occ_cfg)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=True)
    rgb_p, _, acc_p = r_plain.render_image_routed(variables, occ_states, **kw)
    rgb_c, _, acc_c = r_coarse.render_image_routed(variables, occ_states, **kw)
    np.testing.assert_allclose(rgb_c, rgb_p, atol=0.06)
    np.testing.assert_allclose(acc_c, acc_p, atol=0.06)
