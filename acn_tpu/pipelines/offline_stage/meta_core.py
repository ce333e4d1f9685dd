"""Meta-learning inner/outer loops as pure JAX transforms.

TPU-native counterpart of the reference's ``pipelines/offline_stage/meta_core.py``.
The reference implements MAML fast weights by threading an OrderedDict of
tensors through a module tree (task_adapt, meta_core.py:14-68) and dispatches
the outer update imperatively (meta_update, meta_core.py:74-120). Here:

* fast weights are just a params **pytree**; one inner step is
  ``p ← p − lr·∇loss(p)``, the loop is a ``lax.scan``;
* **FoMAML** = ``stop_gradient`` on the inner gradients (then the outer grad
  of the query loss w.r.t. θ equals ∇_fast L_q — exactly the torch
  ``create_graph=False`` semantics);
* **MAML** = no stop_gradient: the outer ``jax.grad`` differentiates *through*
  the scanned inner updates (true second order), with ``jax.checkpoint`` on
  the step body to keep memory linear in inner_iter;
* **Reptile** = θ ← θ + lr·mean(fast − θ), a pure pytree expression.

Everything is vmap-able over tasks and over stacked experts.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Params = Any
# loss_fn(params, batch, key) -> scalar
LossFn = Callable[[Params, Any, jax.Array], jnp.ndarray]


def sgd_tree(params: Params, grads: Params, lr) -> Params:
    """Fast-weight update w ← w − lr·g (reference meta_core.py:61-64)."""
    return jax.tree.map(lambda w, g: w - lr * g, params, grads)


def task_adapt(
    loss_fn: LossFn,
    params: Params,
    support: Any,
    key: jax.Array,
    inner_lr: float,
    iterations: int,
    first_order: bool = True,
    remat: bool = False,
) -> Tuple[Params, jnp.ndarray]:
    """Inner adaptation loop (reference task_adapt, meta_core.py:14-68).

    Returns (fast_params, inner_losses (iterations,)).
    """

    def step(p, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, support, k)
        if first_order:
            grads = jax.lax.stop_gradient(grads)
        return sgd_tree(p, grads, inner_lr), loss

    if remat:
        step = jax.checkpoint(step)

    keys = jax.random.split(key, iterations)
    fast, inner_losses = jax.lax.scan(step, params, keys)
    return fast, inner_losses


def fomaml_outer_loss(
    support_loss_fn: LossFn,
    query_loss_fn: LossFn,
    params: Params,
    support: Any,
    query: Any,
    key: jax.Array,
    inner_lr: float,
    iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query loss after first-order adaptation. Differentiating this w.r.t.
    ``params`` yields the FoMAML meta-gradient."""
    k_in, k_q = jax.random.split(key)
    # remat: mathematically the FoMAML outer grad needs no inner residuals
    # (d fast/dθ = I), but XLA conservatively keeps the scanned inner
    # activations alive without it — 8 iterations × a chip-saturating render
    fast, inner_losses = task_adapt(
        support_loss_fn, params, support, k_in, inner_lr, iterations,
        first_order=True, remat=True,
    )
    return query_loss_fn(fast, query, k_q), inner_losses


def maml_outer_loss(
    support_loss_fn: LossFn,
    query_loss_fn: LossFn,
    params: Params,
    support: Any,
    query: Any,
    key: jax.Array,
    inner_lr: float,
    iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Second-order MAML: gradients flow through the inner updates
    (the reference's ``create_graph=not first_order``, meta_core.py:52-59).
    Inner steps are rematerialized to bound memory."""
    k_in, k_q = jax.random.split(key)
    fast, inner_losses = task_adapt(
        support_loss_fn,
        params,
        support,
        k_in,
        inner_lr,
        iterations,
        first_order=False,
        remat=True,
    )
    return query_loss_fn(fast, query, k_q), inner_losses


def reptile_adapt(
    support_loss_fn: LossFn,
    params: Params,
    support: Any,
    key: jax.Array,
    inner_lr: float,
    iterations: int,
) -> Tuple[Params, jnp.ndarray]:
    """Reptile inner run: plain adaptation from a detached copy
    (reference meta_core.py:27, extract copy=True)."""
    return task_adapt(
        support_loss_fn,
        jax.lax.stop_gradient(params),
        support,
        key,
        inner_lr,
        iterations,
        first_order=True,
    )


def reptile_meta_delta(params: Params, fast_batch: Params) -> Params:
    """Batched Reptile delta Δ̄ = mean_i(W_i − θ) over a leading task axis
    (reference reptile_meta_update, meta_core.py:144-178). Non-finite deltas
    are zeroed (the reference skips them)."""

    def leaf_delta(theta, fast):
        d = jnp.mean(fast - theta[None], axis=0)
        return jnp.where(jnp.isfinite(d), d, 0.0)

    return jax.tree.map(leaf_delta, params, fast_batch)


def global_grad_norm(grads: Params) -> jnp.ndarray:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


ALGOS = ("maml", "fomaml", "reptile")


def outer_loss_fn_for(algo: str):
    algo = algo.lower()
    if algo == "fomaml":
        return fomaml_outer_loss
    if algo == "maml":
        return maml_outer_loss
    raise ValueError(f"No outer loss for algo {algo!r} (reptile has no outer loss)")
