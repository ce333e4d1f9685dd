"""Tests for transformations, COLMAP IO, task routing, and clustering tools."""

import numpy as np
import pytest

from acn_tpu.data import transformations as tf
from acn_tpu.data.colmap import qvec2rotmat, rotmat2qvec
from acn_tpu.data.ray_prep import (
    get_ray_directions_np,
    get_rays_np,
    ray_aabb_intersect_np,
)
from acn_tpu.data.tasks import TaskSampler, make_micro_cells, route_rays_to_cells
from acn_tpu.scripts.create_clusters import (
    grid_centroids,
    kmeans_plusplus,
    make_voronoi_kernel,
)


# ------------------------- geodetic -------------------------


def test_geodetic_ecef_roundtrip():
    lats = np.array([51.549, -33.86, 0.0, 80.0])
    lons = np.array([7.373, 151.21, -120.0, 0.0])
    alts = np.array([233.0, 58.0, -10.0, 1000.0])
    x, y, z = tf.geodetic_to_ecef(lats, lons, alts)
    la2, lo2, al2 = tf.ecef_to_geodetic(x, y, z)
    np.testing.assert_allclose(la2, lats, atol=1e-9)
    np.testing.assert_allclose(lo2, lons, atol=1e-9)
    np.testing.assert_allclose(al2, alts, atol=1e-4)


def test_enu_roundtrip_and_locality():
    lat0, lon0, h0 = 51.549, 7.373, 233.0
    # a point ~100 m north ≈ +100 in N
    lat1 = lat0 + 100.0 / 111_320.0
    e, n, u = tf.geodetic_to_enu(lat1, lon0, h0, lat0, lon0, h0)
    assert abs(float(n) - 100.0) < 0.5
    assert abs(float(e)) < 1e-6
    la, lo, al = tf.enu_to_geodetic(e, n, u, lat0, lon0, h0)
    np.testing.assert_allclose([float(la), float(lo)], [lat1, lon0], atol=1e-9)


def test_enu_rot_orthonormal():
    Q = tf.ecef_to_enu_rot(51.5, 7.4)
    np.testing.assert_allclose(Q @ Q.T, np.eye(3), atol=1e-12)
    # Up axis at (0°, 0°) is ECEF +x
    Q0 = tf.ecef_to_enu_rot(0.0, 0.0)
    np.testing.assert_allclose(Q0[2], [1, 0, 0], atol=1e-12)


def test_basis_constants():
    # RDF→DRB maps RDF x(right)→DRB row Right etc., determinant +1 (proper)
    np.testing.assert_allclose(np.linalg.det(tf.RDF_TO_DRB), 1.0)
    np.testing.assert_allclose(np.linalg.det(tf.ENU_TO_DRB), 1.0)
    np.testing.assert_allclose(tf.RDF_TO_RUB @ tf.RDF_TO_RUB, np.eye(3))


def test_is_likely_ecef():
    assert tf.is_likely_ecef(np.array([[6.37e6, 1e3, 1e3]] * 4))
    assert not tf.is_likely_ecef(np.random.randn(10, 3) * 100)


# ------------------------- colmap quaternions -------------------------


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
        q2 = rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


# ------------------------- numpy/jnp ray parity -------------------------


def test_numpy_jax_ray_parity():
    import jax.numpy as jnp

    from acn_tpu.nerfs import rays as jrays
    from acn_tpu.nerfs import scene_box as sbox

    H, W = 5, 7
    fx, fy, cx, cy = 9.0, 8.0, 3.5, 2.5
    d_np = get_ray_directions_np(H, W, fx, fy, cx, cy, True)
    d_j = np.asarray(jrays.get_ray_directions(H, W, fx, fy, cx, cy, True))
    np.testing.assert_allclose(d_np, d_j, atol=1e-6)

    c2w = np.array(
        [[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3]], np.float32
    )
    aabb = np.array([[-5, -5, -5], [5, 5, 5]], np.float32)
    r_np = get_rays_np(d_np, c2w, aabb=aabb)
    r_j = np.asarray(
        jrays.get_rays(jnp.asarray(d_np), jnp.asarray(c2w), aabb=jnp.asarray(aabb))
    )
    np.testing.assert_allclose(r_np, r_j, atol=2e-5)


# ------------------------- micro-cell routing -------------------------


def test_micro_cells_partition_region():
    region = np.array([[0, 0, 0], [1, 2, 2]], np.float32)
    cells = make_micro_cells(region, 2)
    assert cells.shape == (4, 2, 3)
    # cells tile the YZ plane, keep X whole
    np.testing.assert_allclose(cells[:, 0, 0], 0.0)
    np.testing.assert_allclose(cells[:, 1, 0], 1.0)
    # union covers the region
    np.testing.assert_allclose(cells[:, 0, 1:].min(0), [0, 0])
    np.testing.assert_allclose(cells[:, 1, 1:].max(0), [2, 2])


def test_route_rays_dominant_overlap():
    region = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    cells = make_micro_cells(region, 2)  # 2×2 YZ quadrants
    # straight-down ray through the (+y, +z) quadrant
    rays = np.array(
        [
            [-2, 0.5, 0.5, 1, 0, 0, 0.0, 10.0],
            [-2, -0.5, -0.5, 1, 0, 0, 0.0, 10.0],
            # ray that never intersects the region
            [-2, 5.0, 5.0, 1, 0, 0, 0.0, 10.0],
        ],
        np.float32,
    )
    ids = route_rays_to_cells(rays, cells)
    # quadrant index: iy*2+iz with y,z > 0 ⇒ cell 3; y,z < 0 ⇒ cell 0
    assert ids[0] == 3
    assert ids[1] == 0
    assert ids[2] == -1


def test_task_sampler_fixed_shapes_disjoint():
    class FakeDS:
        def __init__(self):
            rng = np.random.default_rng(0)
            n = 5000
            o = np.concatenate(
                [np.full((n, 1), -2.0), rng.uniform(-1, 1, (n, 2))], 1
            ).astype(np.float32)
            d = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
            nf = np.concatenate(
                [np.zeros((n, 1)), np.full((n, 1), 10.0)], 1
            ).astype(np.float32)
            self.rays = np.concatenate([o, d, nf], 1)
            self.rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
            self.img_indices = np.zeros(n, np.int32)

    region = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    ts = TaskSampler(FakeDS(), region, cell_dim=3, support_rays=64, query_rays=32,
                     seed=0)
    b = ts.sample_batch(4)
    assert b["support_rays"].shape == (4, 64, 8)
    assert b["query_rays"].shape == (4, 32, 8)
    # support/query ray-disjoint when the pool suffices
    t = ts.sample_task()
    s_set = {tuple(r) for r in t.support_rays[:, :3].tolist()}
    q_set = {tuple(r) for r in t.query_rays[:, :3].tolist()}
    # origins are unique per ray in this fake ⇒ disjointness check is valid
    assert not (s_set & q_set)


# ------------------------- clustering -------------------------


def test_grid_centroids_2d():
    cams = np.array([[0, -1, -1], [1, 1, 1]], np.float32)
    c = grid_centroids(cams, 1, 2, 2, cluster_2d=True)
    assert c.shape == (4, 3)
    np.testing.assert_allclose(c[:, 0], 0.5)  # x mid
    np.testing.assert_allclose(sorted(c[:, 1].tolist()), [-0.5, -0.5, 0.5, 0.5])


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (100, 2))
    b = rng.normal(5, 0.1, (100, 2))
    pts = np.concatenate([a, b])
    c = kmeans_plusplus(pts, 2, iters=10, seed=0)
    c = c[np.argsort(c[:, 0])]
    np.testing.assert_allclose(c[0], [0, 0], atol=0.2)
    np.testing.assert_allclose(c[1], [5, 5], atol=0.2)


def test_voronoi_kernel_strict_and_margin():
    cents = np.array(
        [[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]], np.float32
    )
    # vertical rays at y=±0.5 (deep in each cell) and y=0 (boundary)
    rays = np.array(
        [
            [-2, -0.5, 0, 1, 0, 0, 0.0, 4.0],
            [-2, 0.5, 0, 1, 0, 0, 0.0, 4.0],
            [-2, 0.0, 0, 1, 0, 0, 0.0, 4.0],
        ],
        np.float32,
    )
    route = make_voronoi_kernel(cents, True, 1.0, ray_samples=16, chunk=4)
    mask, mins, maxs, counts = route(rays)
    assert mask[0].tolist() == [True, False]
    assert mask[1].tolist() == [False, True]
    assert counts.sum() == 3 * 16
    # AABBs hug assigned sample points
    assert mins[0][1] <= -0.5 <= maxs[0][1] + 1e-5

    route_m = make_voronoi_kernel(cents, True, 1.5, ray_samples=16, chunk=4)
    mask_m, *_ = route_m(rays)
    # boundary ray overlaps both experts with margin
    assert mask_m[2].tolist() == [True, True]
    # deep rays may stay exclusive
    assert mask_m[0][0] and mask_m[1][1]
