"""Meta-train runner for the viewer.

The reference ships only a skeleton here (viewer/engine/runners/meta_train.py,
not wired by its controller — controller.py:164-169). This implementation is
functional: one viewer step = one jitted meta-train step over freshly sampled
episodic batches, sharing the offline pipeline's train step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from acn_tpu.models import container as cont
from acn_tpu.pipelines.offline_stage.train_step import make_meta_train_step
from acn_tpu.pipelines.offline_stage.trainer import dummy_occ_states
from acn_tpu.utils.optim import build_optimizer
from acn_tpu.viewer.engine.runners.base import BaseRunner


class MetaTrainRunner(BaseRunner):
    def __init__(self, ctx: Dict[str, Any]):
        super().__init__(ctx)
        if ctx.get("train_sampler") is None:
            raise ValueError("MetaTrainRunner needs a train_sampler in ctx")
        self.sampler = ctx["train_sampler"]
        labels = cont.param_group_labels(self.variables, self.cfg)
        self.optimizer = build_optimizer(self.P, labels, grad_clip=self.P.grad_clip)
        self._step_fn = jax.jit(
            make_meta_train_step(self.cfg, self.P, self.optimizer)
        )
        self._state = {
            "variables": self.variables,
            "opt_state": self.optimizer.init(self.variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }
        self._occ = (
            self.occ_states
            if self.occ_states is not None
            else dummy_occ_states(self.cfg.num_submodules)
        )
        self._key = jax.random.PRNGKey(self.P.seed)

    def step(self) -> Dict[str, float]:
        batch_np = self.sampler.sample_batch(self.P.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        self._key, k = jax.random.split(self._key)
        self._state, metrics = self._step_fn(self._state, batch, self._occ, k)
        self.variables = self._state["variables"]
        self.steps += 1
        import numpy as np

        psnr = float(np.mean(np.asarray(metrics["psnr_out"])))
        self.psnr_history.append(psnr)
        return {
            "loss": float(metrics["loss_total"]),
            "psnr": psnr,
            "step": float(self.steps),
        }
