"""Mesh-sharded (frame-parallel) rendering vs the single-device path.

One SPMD shard_map program renders n_dev row blocks per dispatch
(renderer._frame_chunk_mesh_fn); every mesh slot runs exactly the
single-device chunk program on its own rows, so output must be
pixel-identical (up to f16/u8 output rounding) on the virtual 8-CPU mesh.
This is the code path behind BASELINE.md's projected-8-chip FPS column.
"""

import types

import jax
import numpy as np

from acn_tpu.parallel.mesh import make_render_mesh
from acn_tpu.pipelines.renderer import Renderer

from test_render_occ import setup_scene
from test_renderer_routed import CAM, _quadrant_scene, _renderer


def _mesh(n=8):
    devs = jax.devices()
    assert len(devs) >= n, f"need {n} virtual devices, have {len(devs)}"
    return make_render_mesh(devs[:n])


def test_mesh_frame_matches_single_device():
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    H, W = 48, 40
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    mesh = _mesh()
    for use_occ in (True, False):
        r = _renderer(cfg, occ_cfg)
        kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb,
                  use_occ=use_occ)
        rgb_1, dep_1, acc_1 = r.render_image(variables, occ_states, **kw)
        rgb_m, dep_m, acc_m = r.render_image(variables, occ_states,
                                             mesh=mesh, **kw)
        np.testing.assert_allclose(rgb_m, rgb_1, atol=1.5 / 255)
        np.testing.assert_allclose(acc_m, acc_1, atol=2e-3)
        np.testing.assert_allclose(dep_m, dep_1, atol=2e-3, rtol=1e-3)


def test_mesh_frame_small_rows_per_device():
    """H smaller than rows_per_dispatch: overrun rows must be discarded
    identically to the single-device path."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    H, W = 10, 16  # rows_per_dev ≥ 1, H << rows*n_dev
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    P = types.SimpleNamespace(
        ray_samples=16, chunk_points=W * 2 * 16 * 2,  # 2 rows per device
        bg_color_default="white", occ_s_max=32, occ_s_kept=16,
        use_amp=False, occ_budget_per_ray=0,
    )
    r = Renderer(cfg, P, occ_cfg)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=False)
    rgb_1, _, acc_1 = r.render_image(variables, occ_states, **kw)
    rgb_m, _, acc_m = r.render_image(variables, occ_states, mesh=_mesh(),
                                     **kw)
    np.testing.assert_allclose(rgb_m, rgb_1, atol=1.5 / 255)
    np.testing.assert_allclose(acc_m, acc_1, atol=2e-3)


def test_mesh_routed_matches_single_device():
    """The routed (per-expert rect) serving path, sharded: each rect's rows
    split over the mesh; stitched output must match the unsharded routed
    render."""
    cfg, variables, occ_cfg, occ_states = _quadrant_scene()
    H = W = 64
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    r = _renderer(cfg, occ_cfg, budget=24)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=True)
    rgb_1, dep_1, acc_1 = r.render_image_routed(variables, occ_states, **kw)
    rgb_m, dep_m, acc_m = r.render_image_routed(
        variables, occ_states, mesh=_mesh(), **kw)
    np.testing.assert_allclose(rgb_m, rgb_1, atol=1.5 / 255)
    np.testing.assert_allclose(acc_m, acc_1, atol=2e-3)


def test_mesh_frame_with_pallas_segscan_backend(monkeypatch):
    """The segscan kernel backend inside the mesh shard_map: the kernel's
    pallas_call produces outputs without vma metadata, which the strict
    shard_map default rejects at trace time — the mesh paths pass
    check_vma=False (renderer.py/baking.py) and the pixels must match the
    XLA-backend single-device render exactly."""
    cfg, variables, occ_cfg, occ_states = setup_scene(K=2)
    H, W = 32, 24
    intr = np.array([0.7 * H, 0.7 * H, W / 2, H / 2], np.float32)
    aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    kw = dict(H=H, W=W, intrinsics=intr, c2w=CAM, aabb=aabb, use_occ=True)

    monkeypatch.delenv("ACN_TPU_SEGSCAN", raising=False)
    r_xla = _renderer(cfg, occ_cfg, budget=16)
    rgb_1, dep_1, acc_1 = r_xla.render_image(variables, occ_states, **kw)

    # fresh Renderer: the backend is resolved at trace time and jitted fns
    # are cached per instance
    monkeypatch.setenv("ACN_TPU_SEGSCAN", "interpret")
    r_pl = _renderer(cfg, occ_cfg, budget=16)
    rgb_m, dep_m, acc_m = r_pl.render_image(variables, occ_states,
                                            mesh=_mesh(), **kw)
    np.testing.assert_allclose(rgb_m, rgb_1, atol=1.5 / 255)
    np.testing.assert_allclose(acc_m, acc_1, atol=2e-3)
    np.testing.assert_allclose(dep_m, dep_1, atol=2e-3, rtol=1e-3)
