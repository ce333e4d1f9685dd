"""Cell-packed hash layout: correctness properties vs the corner oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models.encodings import (
    HashGridConfig,
    hash_encode,
    init_hash_table,
)

CELL = HashGridConfig(levels=3, min_res=4, max_res=16, log2_hashmap_size=8,
                      layout="cell")


def test_cell_tables_shape():
    tables = init_hash_table(jax.random.PRNGKey(0), CELL)
    assert isinstance(tables, list) and len(tables) == CELL.levels
    for t in tables:
        assert t.shape == (CELL.table_size, 8 * CELL.features_per_level)


def test_cell_encode_shape_and_determinism():
    tables = init_hash_table(jax.random.PRNGKey(0), CELL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01, maxval=0.99)
    y1 = hash_encode(tables, x, CELL)
    y2 = hash_encode(tables, x, CELL)
    assert y1.shape == (64, CELL.out_dim)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_cell_trilerp_exact_at_corners():
    """At intra-cell corner positions the encoding equals the packed corner
    feature exactly (trilinear weights become one-hot)."""
    cfg = HashGridConfig(levels=1, min_res=4, max_res=4, log2_hashmap_size=8,
                         layout="cell", features_per_level=2)
    tables = init_hash_table(jax.random.PRNGKey(0), cfg)
    # point just inside cell (1,2,3) at its 000 corner: x = cell/res + eps
    res = 4
    eps = 1e-6
    x = jnp.array([[1 / res + eps, 2 / res + eps, 3 / res + eps]])
    y = np.asarray(hash_encode(tables, x, cfg))[0]

    # expected: row = hash(cell) → corner c000 features (first F entries)
    from acn_tpu.models.encodings import _spatial_hash

    h = int(_spatial_hash(jnp.array([[1, 2, 3]]), cfg.log2_hashmap_size)[0])
    expected = np.asarray(tables[0][h][:2])
    np.testing.assert_allclose(y, expected, atol=1e-4)


def test_cell_encode_continuity_within_cell():
    tables = init_hash_table(jax.random.PRNGKey(2), CELL)
    x = jnp.array([[0.33, 0.52, 0.71]])
    y0 = hash_encode(tables, x, CELL)
    y1 = hash_encode(tables, x + 1e-6, CELL)
    assert float(jnp.max(jnp.abs(y1 - y0))) < 1e-3


def test_cell_grads_flow_per_level():
    tables = init_hash_table(jax.random.PRNGKey(3), CELL)
    x = jax.random.uniform(jax.random.PRNGKey(4), (128, 3))

    g = jax.grad(lambda ts: jnp.sum(hash_encode(ts, x, CELL) ** 2))(tables)
    assert len(g) == CELL.levels
    for gl in g:
        assert np.isfinite(np.asarray(gl)).all()
        assert float(jnp.sum(jnp.abs(gl))) > 0


def test_cell_ngp_end_to_end():
    from acn_tpu.models.ngp import NGPConfig, init_ngp, ngp_forward
    from acn_tpu.nerfs import scene_box as sbox

    cfg = NGPConfig(hidden=16, color_hidden=16, hash=CELL)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    aabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    xd = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    out = ngp_forward(params, cfg, aabb, xd)
    assert out.shape == (32, 4)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.sum(ngp_forward(p, cfg, aabb, xd)))(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_dense_levels_clamp_and_index():
    """dense_levels=True: coarse levels get res^3 tables with collision-free
    linear indexing; two points in different cells never alias, and the
    encode output shape is unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from acn_tpu.models.encodings import (
        HashGridConfig, hash_encode, init_hash_table,
    )

    cfg = HashGridConfig(levels=3, min_res=4, max_res=16,
                         log2_hashmap_size=10, layout="cell",
                         dense_levels=True)
    tables = init_hash_table(jax.random.PRNGKey(0), cfg)
    # level rows clamp: 4^3=64, then intermediates, max 16^3 > 1024 → 1024
    assert tables[0].shape[0] == 64
    assert tables[-1].shape[0] == min(1024, 16 ** 3)

    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    out = hash_encode(tables, x, cfg)
    assert out.shape == (128, cfg.levels * cfg.features_per_level)
    assert np.isfinite(np.asarray(out)).all()

    # grads flow into the dense tables
    g = jax.grad(lambda t: hash_encode(t, x, cfg).sum())(tables)
    assert any(float(jnp.abs(gi).sum()) > 0 for gi in g)


def test_dense_level_is_collision_free():
    """At a dense level, distinct cells address distinct rows: setting one
    cell's row changes only queries inside that cell."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from acn_tpu.models.encodings import (
        HashGridConfig, hash_encode, init_hash_table,
    )

    cfg = HashGridConfig(levels=1, min_res=4, max_res=4,
                         log2_hashmap_size=12, layout="cell",
                         dense_levels=True)
    tables = init_hash_table(jax.random.PRNGKey(0), cfg)
    tables = [jnp.zeros_like(tables[0])]
    # poke cell (1, 2, 3): row = (1*4 + 2)*4 + 3 = 27
    tables[0] = tables[0].at[27].set(1.0)

    inside = jnp.array([[0.375, 0.625, 0.875]])  # cell (1,2,3) at res 4
    outside = jnp.array([[0.1, 0.1, 0.1]])
    assert float(jnp.abs(hash_encode(tables, inside, cfg)).sum()) > 0
    assert float(jnp.abs(hash_encode(tables, outside, cfg)).sum()) == 0


def test_save_rows_vjp_matches_remat():
    """The row-saving custom VJP (cell_backward='save_rows') must produce
    bit-comparable gradients to the remat/autodiff path for both table and
    position cotangents, across interpolation modes and dense levels."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from acn_tpu.models.encodings import (
        HashGridConfig,
        hash_encode,
        init_hash_table,
    )

    for interp in ("Linear", "Smoothstep"):
        for dense in (False, True):
            cfg_s = HashGridConfig(
                levels=4, min_res=4, max_res=32, log2_hashmap_size=8,
                layout="cell", interpolation=interp, dense_levels=dense,
                cell_backward="save_rows",
            )
            cfg_r = dataclasses.replace(cfg_s, cell_backward="remat")
            tab = init_hash_table(jax.random.PRNGKey(0), cfg_s)
            x = jax.random.uniform(
                jax.random.PRNGKey(1), (257, 3), minval=0.01, maxval=0.99
            )

            np.testing.assert_allclose(
                np.asarray(hash_encode(tab, x, cfg_s)),
                np.asarray(hash_encode(tab, x, cfg_r)),
                rtol=1e-6, atol=1e-6,
            )

            def loss(t, x, cfg):
                return jnp.sum(jnp.sin(hash_encode(t, x, cfg) * 3.0))

            gt_s, gx_s = jax.grad(loss, argnums=(0, 1))(tab, x, cfg_s)
            gt_r, gx_r = jax.grad(loss, argnums=(0, 1))(tab, x, cfg_r)
            for a, b in zip(jax.tree.leaves(gt_s), jax.tree.leaves(gt_r)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
                )
            np.testing.assert_allclose(
                np.asarray(gx_s), np.asarray(gx_r), rtol=2e-4, atol=2e-4
            )
