import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models.encodings import (
    HASH_PRIMES,
    HashGridConfig,
    components_from_spherical_harmonics,
    frequency_encode,
    frequency_out_dim,
    hash_encode_jnp,
    init_hash_table,
    sh_encode,
)


# ------------------------- spherical harmonics -------------------------


def test_sh_degree0_constant():
    d = jnp.array([[0.0, 0.0, 1.0]])
    c = components_from_spherical_harmonics(0, d)
    np.testing.assert_allclose(c, [[0.28209479177387814]])


def test_sh_orthonormality_monte_carlo():
    # Real SH bases are orthonormal over the sphere: (4π/N) Σ Y_i Y_j ≈ δ_ij.
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (200_000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    Y = components_from_spherical_harmonics(4, v)  # (N, 25)
    gram = (4 * np.pi / v.shape[0]) * np.asarray(Y.T @ Y)
    np.testing.assert_allclose(gram, np.eye(25), atol=0.05)


def test_sh_encode_normalizes_input():
    d = jnp.array([[0.0, 0.0, 2.0]])  # unnormalized
    c = sh_encode(d, levels=4)
    c_unit = sh_encode(jnp.array([[0.0, 0.0, 1.0]]), levels=4)
    np.testing.assert_allclose(c, c_unit, atol=1e-6)
    assert c.shape == (1, 16)


# ------------------------- frequency encoding -------------------------


def test_frequency_encode_layout_and_values():
    # Reference layout (encodings.py:437-444): [x, per-dim [cos(2^k x)..., sin(2^k x)...]]
    x = jnp.array([[0.5, -0.25, 1.0]])
    pe = frequency_encode(x, pe_dim=2, include_input=True, use_pi=False)
    assert pe.shape == (1, frequency_out_dim(3, 2, True))
    np.testing.assert_allclose(pe[0, :3], [0.5, -0.25, 1.0])
    # dim 0: cos(0.5), cos(1.0), sin(0.5), sin(1.0)
    np.testing.assert_allclose(
        pe[0, 3:7],
        [np.cos(0.5), np.cos(1.0), np.sin(0.5), np.sin(1.0)],
        rtol=1e-6,
    )


def test_frequency_encode_no_input_pi():
    x = jnp.array([[1.0]])
    pe = frequency_encode(x, pe_dim=1, include_input=False, use_pi=True)
    np.testing.assert_allclose(pe, [[np.cos(np.pi), np.sin(np.pi)]], atol=1e-6)


# ------------------------- hash grid -------------------------


def _numpy_hash_encode(table, x01, cfg: HashGridConfig):
    """Independent numpy transcription of the reference torch fallback
    (encodings.py:308-381) as the test oracle."""
    table = np.asarray(table, np.float64)
    x01 = np.asarray(x01, np.float64)
    L, F = cfg.levels, cfg.features_per_level
    res = cfg.level_resolutions().astype(np.float64)  # (L,)
    scaled = x01[:, None, :] * res[None, :, None]  # (N, L, 3)

    def gather(ix, iy, iz):
        h = (
            ix.astype(np.int64) * HASH_PRIMES[0]
            ^ iy.astype(np.int64) * HASH_PRIMES[1]
            ^ iz.astype(np.int64) * HASH_PRIMES[2]
        ) % (2**cfg.log2_hashmap_size)
        offs = np.arange(L, dtype=np.int64) * cfg.table_size
        return table[h + offs[None, :]]  # (N, L, F)

    if cfg.interpolation == "Nearest":
        idx = np.round(scaled).astype(np.int64)
        return gather(idx[..., 0], idx[..., 1], idx[..., 2]).reshape(len(x01), L * F)

    floor = np.floor(scaled)
    frac = scaled - floor
    fl = floor.astype(np.int64)
    corners = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corners[(dx, dy, dz)] = gather(
                    fl[..., 0] + dx, fl[..., 1] + dy, fl[..., 2] + dz
                )
    wx, wy, wz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    if cfg.interpolation == "Smoothstep":
        wx = wx * wx * (3 - 2 * wx)
        wy = wy * wy * (3 - 2 * wy)
        wz = wz * wz * (3 - 2 * wz)
    c00 = corners[(0, 0, 0)] * (1 - wx) + corners[(1, 0, 0)] * wx
    c01 = corners[(0, 0, 1)] * (1 - wx) + corners[(1, 0, 1)] * wx
    c10 = corners[(0, 1, 0)] * (1 - wx) + corners[(1, 1, 0)] * wx
    c11 = corners[(0, 1, 1)] * (1 - wx) + corners[(1, 1, 1)] * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    feats = c0 * (1 - wz) + c1 * wz
    return feats.reshape(len(x01), L * F)


def test_hash_encode_matches_reference_math():
    cfg = HashGridConfig(levels=4, min_res=4, max_res=64, log2_hashmap_size=10,
                         features_per_level=2)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=0.001, maxval=0.999)
    got = np.asarray(hash_encode_jnp(table, x, cfg))
    want = _numpy_hash_encode(table, x, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_hash_encode_smoothstep_and_nearest():
    for interp in ("Smoothstep", "Nearest"):
        cfg = HashGridConfig(levels=3, min_res=4, max_res=32, log2_hashmap_size=8,
                             features_per_level=2, interpolation=interp)
        table = init_hash_table(jax.random.PRNGKey(2), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=0.01, maxval=0.99)
        got = np.asarray(hash_encode_jnp(table, x, cfg))
        want = _numpy_hash_encode(table, x, cfg)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_hash_encode_continuity():
    # trilinear interpolation ⇒ tiny input perturbation ⇒ tiny output change
    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    table = init_hash_table(jax.random.PRNGKey(4), cfg)
    x = jnp.array([[0.37, 0.55, 0.71]])
    y0 = hash_encode_jnp(table, x, cfg)
    y1 = hash_encode_jnp(table, x + 1e-5, cfg)
    assert float(jnp.max(jnp.abs(y1 - y0))) < 1e-3


def test_hash_encode_grad_flows_to_table():
    cfg = HashGridConfig(levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    table = init_hash_table(jax.random.PRNGKey(5), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(6), (32, 3))

    g = jax.grad(lambda t: jnp.sum(hash_encode_jnp(t, x, cfg) ** 2))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_level_resolutions_growth():
    cfg = HashGridConfig(levels=16, min_res=16, max_res=4096)
    res = cfg.level_resolutions()
    assert res[0] == 16
    assert res[-1] == 4096 or abs(res[-1] - 4096) <= 1  # floor of geometric growth
    assert np.all(np.diff(res) >= 0)
