"""Meta-training pipeline tests on a synthetic scene (CPU, 8 virtual devices)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.models.encodings import HashGridConfig
from acn_tpu.models.ngp import NGPConfig
from acn_tpu.nerfs import scene_box as sbox
from acn_tpu.parallel.mesh import make_mesh, shard_by_expert_axis
from acn_tpu.pipelines.offline_stage import meta_core
from acn_tpu.pipelines.offline_stage.train_step import (
    make_eval_step,
    make_meta_train_step,
)
from acn_tpu.pipelines.offline_stage.trainer import dummy_occ_states
from acn_tpu.utils.optim import build_optimizer

K, T, S, Q = 2, 2, 64, 32


def make_P(**kw):
    d = dict(
        algo="fomaml",
        inner_iter=2,
        inner_lr=0.01,
        ray_samples=16,
        color_space="linear",
        bg_color_default="white",
        optimizer="adam",
        encoding_lr=1e-2,
        sigma_lr=2e-3,
        color_lr=2e-3,
        bg_lr=1e-3,
        lr=1e-4,
        outer_steps=100,
        decay_factor=10.0,
        no_scheduler=False,
        grad_clip=1.0,
        occ_s_max=64,
        occ_s_kept=16,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def toy_setup(use_bg=True):
    cfg = ContainerConfig(
        num_submodules=K,
        boundary_margin=1.1,
        use_bg_nerf=use_bg,
        expert=NGPConfig(
            hidden=16,
            color_hidden=16,
            hash=HashGridConfig(levels=2, min_res=4, max_res=16, log2_hashmap_size=8),
        ),
    )
    cents = jnp.array([[0.0, -0.5, 0.0], [0.0, 0.5, 0.0]])
    boxes = jnp.stack([sbox.make_aabb([-1, -1, -1], [1, 1, 1])] * K)
    gaabb = sbox.make_aabb([-1, -1, -1], [1, 1, 1])
    variables = cont.init_container(jax.random.PRNGKey(0), cfg, cents, boxes, gaabb)
    return cfg, variables


def toy_batch(key):
    """Rays through the unit box from z=+2 looking down -z; GT mid-gray."""
    ks = jax.random.split(key, 4)
    o = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (K, T, S + Q, 2), minval=-0.5, maxval=0.5),
            jnp.full((K, T, S + Q, 1), 2.0),
        ],
        axis=-1,
    )
    d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (K, T, S + Q, 1))
    near = jnp.full((K, T, S + Q, 1), 1.0)
    far = jnp.full((K, T, S + Q, 1), 3.0)
    rays = jnp.concatenate([o, d, near, far], axis=-1)
    rgbs = jnp.full((K, T, S + Q, 3), 0.5)
    return {
        "support_rays": rays[:, :, :S],
        "support_rgbs": rgbs[:, :, :S],
        "query_rays": rays[:, :, S:],
        "query_rgbs": rgbs[:, :, S:],
    }


# ------------------------- meta_core unit tests -------------------------


def test_task_adapt_quadratic_converges():
    # loss = ||p - target||²; inner SGD must approach target
    target = jnp.array([1.0, -2.0, 3.0])
    loss_fn = lambda p, batch, key: jnp.sum((p - target) ** 2)
    p0 = jnp.zeros(3)
    fast, losses = meta_core.task_adapt(
        loss_fn, p0, None, jax.random.PRNGKey(0), 0.25, 10
    )
    assert float(losses[0]) > float(losses[-1])
    np.testing.assert_allclose(fast, target, atol=0.1)


def test_fomaml_equals_grad_at_fast():
    """FoMAML meta-grad = ∇_fast L_q evaluated at adapted params."""
    target_s = jnp.array([2.0])
    target_q = jnp.array([3.0])
    s_loss = lambda p, b, k: jnp.sum((p - target_s) ** 2)
    q_loss = lambda p, b, k: jnp.sum((p - target_q) ** 2)
    p0 = jnp.array([0.0])
    lr, iters = 0.1, 3

    def outer(p):
        l, _ = meta_core.fomaml_outer_loss(
            s_loss, q_loss, p, None, None, jax.random.PRNGKey(0), lr, iters
        )
        return l

    g = jax.grad(outer)(p0)
    fast, _ = meta_core.task_adapt(
        s_loss, p0, None, jax.random.PRNGKey(0), lr, iters, first_order=True
    )
    g_manual = jax.grad(lambda p: q_loss(p, None, None))(fast)
    np.testing.assert_allclose(g, g_manual, rtol=1e-6)


def test_maml_second_order_differs_from_fomaml():
    """For a quadratic, MAML grad = (1−2lr)^n · ∇_fast L_q ≠ FoMAML grad."""
    s_loss = lambda p, b, k: jnp.sum(p**2)
    q_loss = lambda p, b, k: jnp.sum((p - 1.0) ** 2)
    p0 = jnp.array([0.5])
    lr, iters = 0.1, 2

    g_maml = jax.grad(
        lambda p: meta_core.maml_outer_loss(
            s_loss, q_loss, p, None, None, jax.random.PRNGKey(0), lr, iters
        )[0]
    )(p0)
    g_fo = jax.grad(
        lambda p: meta_core.fomaml_outer_loss(
            s_loss, q_loss, p, None, None, jax.random.PRNGKey(0), lr, iters
        )[0]
    )(p0)
    # fast = (1-2lr)^2 p0; dfast/dp = (1-2lr)^2 = 0.64
    np.testing.assert_allclose(g_maml, 0.64 * g_fo, rtol=1e-5)


def test_reptile_delta():
    theta = {"w": jnp.zeros(3)}
    fast_batch = {"w": jnp.stack([jnp.ones(3), 3 * jnp.ones(3)])}
    delta = meta_core.reptile_meta_delta(theta, fast_batch)
    np.testing.assert_allclose(delta["w"], 2 * np.ones(3))


# ------------------------- full train step -------------------------


@pytest.mark.parametrize("algo", ["fomaml", "reptile", "maml"])
def test_train_step_reduces_loss(algo):
    # reptile: θ ← θ + lr·(fast − θ); lr=1.0 moves θ to the adapted params
    P = make_P(
        algo=algo,
        inner_iter=1 if algo == "maml" else 2,
        lr=1.0 if algo == "reptile" else 1e-4,
    )
    cfg, variables = toy_setup()
    labels = cont.param_group_labels(variables, cfg)
    opt = build_optimizer(P, labels)
    step_fn = jax.jit(make_meta_train_step(cfg, P, opt))

    state = {
        "variables": variables,
        "opt_state": opt.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    occ = dummy_occ_states(K)
    batch = toy_batch(jax.random.PRNGKey(1))

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, occ, k)
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_eval_step_psnr_shapes():
    P = make_P()
    cfg, variables = toy_setup()
    ev = jax.jit(make_eval_step(cfg, P, tto=1))
    batch = toy_batch(jax.random.PRNGKey(3))
    m = ev(variables, batch, dummy_occ_states(K), jax.random.PRNGKey(4))
    assert m["psnr_out"].shape == (K,)
    assert np.isfinite(float(m["psnr"]))


def test_train_step_sharded_matches_single_device():
    """The expert-sharded step must produce the same numbers as unsharded."""
    P = make_P(algo="fomaml")
    cfg, variables = toy_setup()
    labels = cont.param_group_labels(variables, cfg)
    opt = build_optimizer(P, labels)
    step_fn = jax.jit(make_meta_train_step(cfg, P, opt))

    state0 = {
        "variables": variables,
        "opt_state": opt.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    batch = toy_batch(jax.random.PRNGKey(1))
    occ = dummy_occ_states(K)
    k = jax.random.PRNGKey(7)

    _, m_single = step_fn(state0, batch, occ, k)

    mesh = make_mesh(K, mesh_experts=2, mesh_data=1)
    assert mesh is not None, "conftest should expose 8 CPU devices"
    state_sh = shard_by_expert_axis(state0, mesh, K)
    batch_sh = shard_by_expert_axis(batch, mesh, K)
    occ_sh = shard_by_expert_axis(occ, mesh, K)
    _, m_shard = step_fn(state_sh, batch_sh, occ_sh, k)

    np.testing.assert_allclose(
        float(m_single["loss_total"]), float(m_shard["loss_total"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(m_single["psnr_out"]), np.asarray(m_shard["psnr_out"]), rtol=1e-4
    )


def test_maybe_init_distributed_noop_without_env(monkeypatch):
    """Single-process default: no coordination env vars → untouched runtime."""
    from acn_tpu.parallel.mesh import maybe_init_distributed

    for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "PROCESS_ID", "JAX_PROCESS_ID", "NUM_PROCESSES",
                "JAX_NUM_PROCESSES"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_init_distributed() is False
