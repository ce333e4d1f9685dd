"""Fisher-information-weighted adaptation (FIM).

Counterpart of the reference's ``models/fim.py`` (FisherMatrix / FIMLoss) and
the Fisher branch of ``nerfs/losses.py``. In the reference this subsystem is
scaffolded but **unwired** — ``compute_fim_loss`` bails to plain MSE unless
``model.fisher_store`` exists, and nothing ever attaches it
(losses.py:76-81, SURVEY §2.8). Here it is functional and actually usable
behind ``--fim``:

* ``fisher_update`` — EMA of squared gradients per parameter leaf
  (reference fim.py:4-34): F ← β F + (1−β) g²;
* ``fisher_scaled_grads`` — precondition adaptation gradients by the inverse
  Fisher diagonal g/(F + ε), optionally λ-blended with the raw gradient —
  the natural-gradient-flavored inner update the reference intended.

State is just a pytree shaped like the params; it threads through
``task_adapt`` as extra carry.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

Params = Any


def fisher_init(params: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, params)


def fisher_update(fisher: Params, grads: Params, beta: float = 0.95) -> Params:
    """EMA of squared grads (reference fim.py:14-34)."""
    return jax.tree.map(
        lambda f, g: beta * f + (1.0 - beta) * jnp.square(g), fisher, grads
    )


def fisher_scaled_grads(
    fisher: Params,
    grads: Params,
    lam: float = 0.1,
    epsilon: float = 1e-6,
) -> Params:
    """Blend raw and inverse-Fisher-preconditioned gradients:
    g' = (1−λ)·g + λ·g/(F + ε) (reference fim.py:37-93 semantics)."""
    return jax.tree.map(
        lambda f, g: (1.0 - lam) * g + lam * g / (f + epsilon), fisher, grads
    )


def fim_task_adapt(
    loss_fn,
    params: Params,
    fisher: Params,
    support,
    key: jax.Array,
    inner_lr: float,
    iterations: int,
    beta: float = 0.95,
    lam: float = 0.1,
    epsilon: float = 1e-6,
) -> Tuple[Params, Params, jnp.ndarray]:
    """Inner loop with Fisher-preconditioned SGD and Fisher EMA updates on
    the support gradients. Returns (fast_params, fisher, inner_losses)."""

    def step(carry, k):
        p, f = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, support, k)
        grads = jax.lax.stop_gradient(grads)
        f = fisher_update(f, grads, beta)
        g = fisher_scaled_grads(f, grads, lam, epsilon)
        p = jax.tree.map(lambda w, gg: w - inner_lr * gg, p, g)
        return (p, f), loss

    keys = jax.random.split(key, iterations)
    (fast, fisher), losses = jax.lax.scan(step, (params, fisher), keys)
    return fast, fisher, losses
