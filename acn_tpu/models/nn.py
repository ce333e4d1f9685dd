"""Minimal functional NN primitives over parameter pytrees.

Replaces the reference's ``models/metamodule`` fast-weight machinery
(metamodule.py:13-192): in JAX, "fast weights" are just another params pytree,
so MAML-style inner loops need no module plumbing — ``jax.grad`` over the
pytree composes directly, and stacking a leading axis turns K experts into a
vmap.

Initialization matches torch ``nn.Linear`` defaults
(U(−1/√fan_in, 1/√fan_in) for both weight and bias) so statistical behavior
tracks the reference's ``MetaLinear`` (metamodule.py:129-156).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Params = Dict[str, Any]


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """torch-default Linear init. Weight stored (in_dim, out_dim) —
    row-major activation matmul ``x @ w`` maps straight onto the MXU."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(in_dim))
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -1.0, 1.0) * bound
    p = {"w": w}
    if bias:
        b = jax.random.uniform(kb, (out_dim,), dtype, -1.0, 1.0) * bound
        p["b"] = b
    return p


def apply_linear(p: Params, x: Array) -> Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
    "identity": lambda x: x,
}


def init_mlp(
    key: jax.Array,
    dims: Sequence[int],
    dtype=jnp.float32,
) -> List[Params]:
    """A stack of Linear layers with the given dims chain."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        init_linear(k, dims[i], dims[i + 1], dtype=dtype) for i, k in enumerate(keys)
    ]


def apply_mlp(
    layers: Sequence[Params],
    x: Array,
    activation: str = "relu",
    final_activation: str = "none",
) -> Array:
    act = _ACTIVATIONS[activation]
    final = _ACTIVATIONS[final_activation]
    n = len(layers)
    for i, p in enumerate(layers):
        x = apply_linear(p, x)
        x = final(x) if i == n - 1 else act(x)
    return x


def tree_cast(params, dtype):
    """Cast every floating leaf of a params pytree."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
