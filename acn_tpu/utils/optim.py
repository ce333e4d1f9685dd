"""Optimizers and LR schedules.

Counterpart of the reference's ``common/utils.py`` ``get_optimizer`` /
``get_scheduler`` (common/utils.py:16-96): Adam/AdamW/SGD over *named
parameter groups* — encoding / sigma / color / background — each with its own
learning rate, all decayed exponentially to ``lr/decay_factor`` over
``outer_steps``. Implemented with ``optax.multi_transform`` keyed by the
per-leaf group labels from the model's ``param_group_labels``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax


def exponential_schedule(
    base_lr: float, outer_steps: int, decay_factor: float, enabled: bool = True
) -> optax.Schedule:
    """lr(t) = lr₀ · decay_factor^(−t/outer_steps): per-step gamma
    (1/decay)^{1/steps}, final lr = lr₀/decay (reference common/utils.py:79-96)."""
    if not enabled or decay_factor in (None, 1, 1.0):
        return optax.constant_schedule(base_lr)
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=max(int(outer_steps), 1),
        decay_rate=1.0 / float(decay_factor),
    )


def _base_opt(name: str, schedule: optax.Schedule) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        return optax.adam(schedule)
    if name == "adamw":
        return optax.adamw(schedule)
    if name == "sgd":
        return optax.sgd(schedule)
    raise ValueError(f"Unsupported optimizer {name!r}")


def build_optimizer(
    P,
    group_labels: Any,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """Per-group optimizer with global-norm clipping
    (clip: reference meta_core.py:181-190; groups: common/utils.py:16-76).

    ``group_labels`` is a pytree (same structure as params) of strings in
    {encoding, sigma, color, background}.
    """
    lrs = {
        "encoding": P.encoding_lr,
        "sigma": P.sigma_lr,
        "color": P.color_lr,
        "background": P.bg_lr,
    }
    enabled = not getattr(P, "no_scheduler", False)
    transforms = {
        g: _base_opt(
            P.optimizer,
            exponential_schedule(lr, P.outer_steps, P.decay_factor, enabled),
        )
        for g, lr in lrs.items()
    }
    opt = optax.multi_transform(transforms, group_labels)
    if grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(float(grad_clip)), opt)
    if getattr(P, "guard_nonfinite", False):
        # skip the whole outer update when any grad is NaN/Inf instead of
        # poisoning the params — the reference's meta-update guard
        # (meta_core.py:124-126). Off by default: wrapping changes the
        # opt_state pytree, which must stay stable across checkpoint resume.
        opt = optax.apply_if_finite(opt, max_consecutive_errors=1000)
    return opt


def current_group_lrs(P, step: int) -> Dict[str, float]:
    """Group LRs at a step, for logging (reference meta_core.py:119-120)."""
    enabled = not getattr(P, "no_scheduler", False)
    out = {}
    for g, lr in (
        ("encoding", P.encoding_lr),
        ("sigma", P.sigma_lr),
        ("color", P.color_lr),
        ("background", P.bg_lr),
    ):
        out[g] = float(
            exponential_schedule(lr, P.outer_steps, P.decay_factor, enabled)(step)
        )
    return out
