"""Pallas segmented-scan kernel vs the associative_scan reference.

Runs the kernel body through the Pallas interpreter (CPU), which exercises
the exact grid/carry/flag logic Mosaic will compile on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acn_tpu.ops.segscan import _seg_excl_sum_xla, seg_excl_sum


def _random_case(rng, b, mean_seg=7, scale=1.0):
    x = rng.normal(size=(b,)).astype(np.float32) * scale
    starts = rng.random(b) < (1.0 / mean_seg)
    starts[0] = True
    return jnp.asarray(x), jnp.asarray(starts)


def _numpy_ref(x, starts):
    out = np.zeros_like(np.asarray(x))
    run = 0.0
    for i in range(len(out)):
        if starts[i]:
            run = 0.0
        out[i] = run
        run += float(x[i])
    return out


@pytest.mark.parametrize("b", [1, 5, 128, 1024, 8192, 8192 + 357])
def test_matches_reference(b):
    rng = np.random.default_rng(b)
    x, starts = _random_case(rng, b)
    got = seg_excl_sum(x, starts, backend="interpret")
    want = _seg_excl_sum_xla(x, starts)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    if b <= 1024:
        np.testing.assert_allclose(got, _numpy_ref(x, starts), rtol=1e-5, atol=1e-5)


def test_multiblock_carry_crosses_grid_steps():
    # one segment spanning several (64, 128) blocks: the SMEM carry is the
    # only way the prefix survives the block boundary
    b = 3 * 64 * 128 + 11
    x = jnp.ones((b,), jnp.float32)
    starts = jnp.zeros((b,), bool).at[0].set(True)
    got = seg_excl_sum(x, starts, backend="interpret")
    np.testing.assert_allclose(got, np.arange(b, dtype=np.float32), rtol=0, atol=0)


def test_boundary_resets_inside_and_across_blocks():
    rng = np.random.default_rng(0)
    b = 2 * 64 * 128
    x, _ = _random_case(rng, b)
    # exactly one boundary, in the middle of block 2
    starts = jnp.zeros((b,), bool).at[0].set(True).at[64 * 128 + 777].set(True)
    got = seg_excl_sum(x, starts, backend="interpret")
    want = _seg_excl_sum_xla(x, starts)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_opaque_scale_precision():
    # serving-scale magnitudes: each sample ≈ −23 log-transmittance. The
    # segmented scan must stay exact per segment even when a global cumsum
    # would hit float32 ulp ≈ 1.0 (the round-4 ADVICE precision bug class).
    rng = np.random.default_rng(1)
    b = 64 * 128 * 4
    x = jnp.full((b,), -23.0, jnp.float32)
    starts = jnp.asarray(rng.random(b) < 1 / 64.0).at[0].set(True)
    got = seg_excl_sum(x, starts, backend="interpret")
    want = _seg_excl_sum_xla(x, starts)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)


def test_gradient_matches_xla_backend():
    rng = np.random.default_rng(2)
    b = 2049
    x, starts = _random_case(rng, b)
    w = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def loss(x, backend):
        return jnp.sum(w * seg_excl_sum(x, starts, backend))

    g_int = jax.grad(lambda x: loss(x, "interpret"))(x)
    g_xla = jax.grad(lambda x: loss(x, "xla"))(x)
    np.testing.assert_allclose(g_int, g_xla, rtol=1e-5, atol=1e-5)


def test_gradient_against_numerics():
    rng = np.random.default_rng(3)
    b = 300
    x, starts = _random_case(rng, b)
    w = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def loss(x):
        return jnp.sum(w * seg_excl_sum(x, starts, "interpret"))

    g = np.asarray(jax.grad(loss)(x))
    eps = 1e-2
    for i in [0, 1, 57, 150, 299]:
        xp = x.at[i].add(eps)
        xm = x.at[i].add(-eps)
        fd = (float(loss(xp)) - float(loss(xm))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-3, atol=5e-3)


def test_vmap_batches_carry_per_element():
    # composite_packed can sit under vmap (training vmaps experts); the
    # pallas batching rule must keep the SMEM carry per batch element
    rng = np.random.default_rng(7)
    k, b = 3, 2 * 64 * 128 + 55
    x = jnp.asarray(rng.normal(size=(k, b)).astype(np.float32))
    s = jnp.asarray(rng.random((k, b)) < 0.05).at[:, 0].set(True)
    got = jax.vmap(lambda a, c: seg_excl_sum(a, c, "interpret"))(x, s)
    want = jax.vmap(_seg_excl_sum_xla)(x, s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_jit_and_under_composite_flag():
    # the dispatcher resolves env/explicit backends; jit-compatible
    rng = np.random.default_rng(4)
    x, starts = _random_case(rng, 4096)
    f = jax.jit(lambda x, s: seg_excl_sum(x, s, "interpret"))
    np.testing.assert_allclose(
        f(x, starts), _seg_excl_sum_xla(x, starts), rtol=1e-6, atol=1e-5
    )


def test_resolve_backend_default_is_platform_aware(monkeypatch):
    """Production default: pallas on real TPU (on-chip validated, BASELINE
    r5/r6), xla elsewhere; ACN_TPU_SEGSCAN always wins."""
    from acn_tpu.ops.segscan import resolve_backend

    monkeypatch.delenv("ACN_TPU_SEGSCAN", raising=False)
    expected = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert resolve_backend("auto") == expected
    monkeypatch.setenv("ACN_TPU_SEGSCAN", "xla")
    assert resolve_backend("auto") == "xla"
    monkeypatch.setenv("ACN_TPU_SEGSCAN", "pallas")
    assert resolve_backend("auto") == "pallas"
    assert resolve_backend("interpret") == "interpret"
