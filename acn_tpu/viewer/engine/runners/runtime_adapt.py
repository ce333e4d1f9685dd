"""Runtime-Adapt runner: one viewer step = one TTO optimizer update.

Counterpart of the reference's ``viewer/engine/runners/runtime_adapt.py``
RuntimeAdaptRunner: lazily iterates continual metadata batches, builds a
support ray store per batch, and steps plain-Adam fine-tuning on it
(reference runtime_adapt.py:139-249). The jitted TTO step is shared with the
offline eval path (pipelines.online_stage.runtime_adapt.make_tto_step).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.data.dataset import get_image_metadata
from acn_tpu.data.ram_rays import RamRaysDataset
from acn_tpu.models import container as cont
from acn_tpu.pipelines.online_stage.runtime_adapt import make_tto_step
from acn_tpu.utils.optim import build_optimizer
from acn_tpu.viewer.engine.runners.base import BaseRunner


class RuntimeAdaptRunner(BaseRunner):
    def __init__(self, ctx: Dict[str, Any], batch_dir: Optional[Path] = None):
        super().__init__(ctx)
        self.rng = np.random.default_rng(self.P.seed)
        self.batch_dirs = self._discover_batches(batch_dir)
        self.batch_idx = -1
        self.support: Optional[RamRaysDataset] = None
        self._tto = None
        self._opt = None
        self._opt_state = None
        self._key = jax.random.PRNGKey(self.P.seed)

    def _discover_batches(self, batch_dir) -> List[Path]:
        """Continual batch dirs, oldest first (reference
        runtime_adapt.py:182-204)."""
        if batch_dir is not None:
            return [Path(batch_dir)]
        cont_dir = Path(self.ctx["data_path"]) / "continual"
        if not cont_dir.exists():
            return []
        return sorted(d for d in cont_dir.iterdir() if d.is_dir())

    def advance_batch(self) -> bool:
        """Load the next continual batch's support rays. Returns False when
        exhausted."""
        self.batch_idx += 1
        if self.batch_idx >= len(self.batch_dirs):
            return False
        bd = self.batch_dirs[self.batch_idx]
        _, metas = get_image_metadata(bd, self.downscale)
        self.support = RamRaysDataset(
            metas,
            center_pixels=True,
            aabb=np.asarray(self.ctx["global_aabb"]),
            near_far_override=(self.P.near, self.P.far),
            num_workers=self.P.num_workers,
        )
        return len(self.support) > 0

    def _ensure_optimizer(self):
        if self._tto is None:
            labels = cont.param_group_labels(self.variables, self.cfg)
            self._opt = build_optimizer(self.P, labels, grad_clip=1.0)
            self._opt_state = self._opt.init(self.variables["params"])
            occ_cfg = self.ctx.get("occ_cfg")
            self._use_occ = (
                occ_cfg is not None and self.ctx.get("occ_states") is not None
            )
            self._tto = make_tto_step(
                self.cfg, self.P, self._opt, occ_cfg, self._use_occ
            )

    def _on_hparams_changed(self):
        # rebuild the optimizer with the new lrs on the next step
        self._tto = None

    def step(self) -> Dict[str, float]:
        """One optimizer update on one support batch
        (reference runtime_adapt.py:139-175)."""
        if self.support is None and not self.advance_batch():
            return {"status": 0.0}
        self._ensure_optimizer()

        rays, rgbs, _ = self.support.sample(self.rng, self.support_rays)
        self._key, k = jax.random.split(self._key)
        occ_states = (
            self.ctx["occ_states"] if self._use_occ else jnp.zeros(())
        )
        params, self._opt_state, loss = self._tto(
            self.variables["params"], self._opt_state,
            self.variables["buffers"], occ_states,
            jnp.asarray(rays), jnp.asarray(rgbs), k,
        )
        # atomic snapshot swap — the render thread picks this up next frame
        self.variables = {"params": params, "buffers": self.variables["buffers"]}
        self.steps += 1
        loss_f = float(loss)
        psnr = float(-10.0 * np.log10(max(loss_f, 1e-12)))
        self.psnr_history.append(psnr)
        return {"loss": loss_f, "psnr": psnr, "step": float(self.steps)}
