"""--guard_nonfinite: skip (not apply) outer updates with NaN/Inf grads.

Counterpart of the reference's meta-update guard (pipelines/offline_stage/
meta_core.py:124-126 — `if torch.isnan(loss): continue`): a non-finite
outer gradient must leave params AND optimizer moments untouched, while
finite gradients keep stepping normally afterwards.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from acn_tpu.utils.optim import build_optimizer


def _P(guard: int) -> argparse.Namespace:
    return argparse.Namespace(
        optimizer="adam",
        lr=1e-3,
        encoding_lr=1e-2,
        sigma_lr=2e-3,
        color_lr=2e-3,
        bg_lr=1e-3,
        no_scheduler=False,
        outer_steps=100,
        decay_factor=10.0,
        guard_nonfinite=guard,
    )


def _setup(guard: int):
    params = {"enc": jnp.ones((4, 2)), "mlp": jnp.ones((3,))}
    labels = {"enc": "encoding", "mlp": "sigma"}
    opt = build_optimizer(_P(guard), labels, grad_clip=1.0)
    return params, opt, opt.init(params)


def test_guard_skips_nonfinite_update():
    params, opt, state = _setup(guard=1)
    bad = {"enc": jnp.full((4, 2), jnp.nan), "mlp": jnp.ones((3,))}
    updates, state = opt.update(bad, state, params)
    stepped = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(stepped["enc"]), np.ones((4, 2)))
    np.testing.assert_array_equal(np.asarray(stepped["mlp"]), np.ones((3,)))

    # a finite grad afterwards still steps
    good = {"enc": jnp.ones((4, 2)), "mlp": jnp.ones((3,))}
    updates, state = opt.update(good, state, params)
    stepped = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(stepped["enc"]), 1.0)
    assert not np.allclose(np.asarray(stepped["mlp"]), 1.0)


def test_unguarded_poisons_params_with_nan():
    # sanity: without the guard, a NaN grad propagates (documents why the
    # flag exists for multi-hour runs)
    params, opt, state = _setup(guard=0)
    bad = {"enc": jnp.full((4, 2), jnp.nan), "mlp": jnp.ones((3,))}
    updates, state = opt.update(bad, state, params)
    stepped = optax.apply_updates(params, updates)
    assert np.isnan(np.asarray(stepped["enc"])).any()


def test_guarded_opt_state_serializes_roundtrip():
    # checkpoint resume builds a fresh template with the same flag and
    # restores bytes onto it (utils/checkpoint.py:229-235)
    params, opt, state = _setup(guard=1)
    grads = {"enc": jnp.ones((4, 2)), "mlp": jnp.ones((3,))}
    _, state = opt.update(grads, state, params)
    raw = serialization.to_bytes(state)
    _, _, template = _setup(guard=1)
    restored = serialization.from_bytes(template, raw)
    a = jax.tree_util.tree_leaves(state)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
