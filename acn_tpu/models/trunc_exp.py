"""Truncated exponential activation with a dtype-safe custom VJP.

TPU-native counterpart of the reference's ``models/trunc_exp.py`` (a torch
autograd Function): both forward and backward use the *clamped* input so the
gradient never overflows in reduced precision. On TPU we train in bf16, whose
exponent range matches fp32, so the fp32 clamp applies to both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Strictly below log(dtype_max) so exp(clamp) is finite under any rounding
# mode (exp(88.7228) rounds to inf on some float32 backends).
_EXP_MAX = {
    jnp.float16.dtype: 11.0,  # exp ~ 5.99e4 < 65504
    jnp.bfloat16.dtype: 88.0,  # exp ~ 1.65e38 < 3.39e38
    jnp.float32.dtype: 88.0,
    jnp.float64.dtype: 709.0,
}


def _exp_clamp(x: jnp.ndarray) -> jnp.ndarray:
    m = _EXP_MAX.get(jnp.asarray(x).dtype, _EXP_MAX[jnp.float32.dtype])
    return jnp.clip(x, -m, m)


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp(x) with input clamped to the dtype-safe range (fwd and bwd)."""
    return jnp.exp(_exp_clamp(x))


def _trunc_exp_fwd(x):
    xc = _exp_clamp(x)
    y = jnp.exp(xc)
    return y, y  # residual: exp(xc) == y, dy/dx = exp(xc)


def _trunc_exp_bwd(y, g):
    return (g * y,)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
