import jax.numpy as jnp
import numpy as np

from acn_tpu.nerfs import scene_box as sbox


def test_basic_props():
    aabb = sbox.make_aabb([-1, -2, -3], [1, 2, 3])
    np.testing.assert_allclose(sbox.center(aabb), [0, 0, 0])
    np.testing.assert_allclose(sbox.extent(aabb), [2, 4, 6])
    np.testing.assert_allclose(
        sbox.diagonal_length(aabb), np.sqrt(4 + 16 + 36), rtol=1e-6
    )


def test_slab_closed_form():
    # Unit cube [0,1]^3; ray from (-1, .5, .5) along +x hits at t=1, exits t=2.
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    o = jnp.array([[-1.0, 0.5, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    tmin, tmax = sbox.ray_aabb_intersect(aabb, o, d)
    np.testing.assert_allclose(tmin, [1.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [2.0], atol=1e-6)


def test_slab_inside_origin_clamps_to_zero():
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    o = jnp.array([[0.5, 0.5, 0.5]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    tmin, tmax = sbox.ray_aabb_intersect(aabb, o, d)
    np.testing.assert_allclose(tmin, [0.0], atol=1e-6)
    np.testing.assert_allclose(tmax, [0.5], atol=1e-6)


def test_slab_miss_tagged_invalid():
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    # Pointing away from the box.
    o = jnp.array([[-1.0, 0.5, 0.5]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    tmin, tmax = sbox.ray_aabb_intersect(aabb, o, d)
    assert float(tmin[0]) == sbox.AABB_INVALID_VALUE
    assert float(tmax[0]) == sbox.AABB_INVALID_VALUE


def test_slab_zero_direction_guard():
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    o = jnp.array([[0.5, 0.5, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tmin, tmax = sbox.ray_aabb_intersect(aabb, o, d)
    assert np.isfinite(float(tmin[0])) and float(tmax[0]) <= sbox.AABB_MAX_BOUND
    np.testing.assert_allclose(tmin, [1.0], atol=1e-5)


def test_within_and_normalize():
    aabb = sbox.make_aabb([0, 0, 0], [2, 2, 2])
    pts = jnp.array([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
    w = sbox.within(aabb, pts)
    assert list(np.asarray(w)) == [True, False, False]
    w_inc = sbox.within(aabb, pts, inclusive=True)
    assert list(np.asarray(w_inc)) == [True, False, True]
    norm = sbox.normalized_positions(pts, aabb)
    np.testing.assert_allclose(norm[0], [0.5, 0.5, 0.5])


def test_union_expand_reduce():
    a = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    b = sbox.make_aabb([-1, 0.5, 0], [0.5, 2, 1])
    u = sbox.union(a, b)
    np.testing.assert_allclose(u[0], [-1, 0, 0])
    np.testing.assert_allclose(u[1], [1, 2, 1])
    r = sbox.reduce_union(jnp.stack([a, b]))
    np.testing.assert_allclose(r, u)
    e = sbox.expand(a, 0.5)
    np.testing.assert_allclose(e[0], [-0.5] * 3)
    e2 = sbox.expand(a, np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]))
    np.testing.assert_allclose(e2[0], [-0.1, -0.2, -0.3], rtol=1e-6)
    np.testing.assert_allclose(e2[1], [1.4, 1.5, 1.6], rtol=1e-6)


def test_intersects_segment_prefilter():
    aabb = sbox.make_aabb([0, 0, 0], [1, 1, 1])
    rays = jnp.array(
        [
            # hits box within [near, far]
            [-1, 0.5, 0.5, 1, 0, 0, 0.0, 10.0],
            # box behind the far plane
            [-1, 0.5, 0.5, 1, 0, 0, 0.0, 0.5],
            # pointing away
            [-1, 0.5, 0.5, -1, 0, 0, 0.0, 10.0],
        ],
        dtype=jnp.float32,
    )
    hit = sbox.intersects_segment(aabb, rays)
    assert list(np.asarray(hit)) == [True, False, False]


def test_oriented_box():
    import numpy as np
    from acn_tpu.nerfs.scene_box import (
        obb_from_params, obb_to_aabb, obb_within, within,
    )

    # axis-aligned OBB == AABB semantics
    obb = obb_from_params((1.0, 2.0, 3.0), (0.0, 0.0, 0.0), (2.0, 4.0, 6.0))
    aabb = obb_to_aabb(obb)
    np.testing.assert_allclose(np.asarray(aabb), [[0, 0, 0], [2, 4, 6]], atol=1e-6)
    pts = jnp.array([[1.0, 2.0, 3.0], [2.1, 2.0, 3.0], [0.5, 0.5, 0.5]])
    np.testing.assert_array_equal(
        np.asarray(obb_within(obb, pts)), [True, False, True]
    )

    # rotated 90° about z: x-extent and y-extent swap
    obb = obb_from_params((0.0, 0.0, 0.0), (0.0, 0.0, np.pi / 2), (2.0, 6.0, 4.0))
    aabb = obb_to_aabb(obb)
    np.testing.assert_allclose(
        np.asarray(aabb), [[-3, -1, -2], [3, 1, 2]], atol=1e-5
    )
    # a point at x=2.5 (inside the rotated long axis) is inside
    assert bool(obb_within(obb, jnp.array([[2.5, 0.0, 0.0]]))[0])
    assert not bool(obb_within(obb, jnp.array([[0.0, 2.5, 0.0]]))[0])
