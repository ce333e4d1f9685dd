"""Viewer training runners: base machinery.

Counterpart of the reference's ``viewer/engine/runners/base.py``. The
reference guards a mutable torch module with a global ``model_lock``
(base.py:8) so the render thread and the training thread don't race. In JAX,
parameters are immutable pytrees: the runner *swaps a reference* to the
latest variables atomically (Python attribute assignment), the render thread
reads whichever snapshot is current, and no lock is needed around compute —
only a tiny lock around checkpoint IO.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

io_lock = threading.Lock()


class BaseRunner:
    """Holds the live (variables, occ_states) snapshot plus runtime knobs.

    Mirrors the reference BaseRunner surface: reset to the initial state,
    runtime checkpoint save/load, live lr/ray/chunk updates
    (reference base.py:29-183).
    """

    def __init__(self, ctx: Dict[str, Any]):
        self.ctx = ctx
        self.P = ctx["P"]
        self.cfg = ctx["cfg"]
        self.variables = ctx["variables"]
        self.occ_states = ctx.get("occ_states")
        self._initial_variables = jax.tree.map(lambda x: x, ctx["variables"])
        self.steps = 0
        self.psnr_history = []
        # live knobs (reference base.py:83-183)
        self.support_rays = int(self.P.support_rays)
        self.ray_samples = int(self.P.ray_samples)
        self.downscale = float(self.P.downscale)
        self.lrs = {
            "encoding": float(self.P.encoding_lr),
            "sigma": float(self.P.sigma_lr),
            "color": float(self.P.color_lr),
            "background": float(self.P.bg_lr),
        }

    # ---- reference surface ----

    def reset_fast(self) -> None:
        """Restore the original weights and clear step count
        (reference base.py:29-43)."""
        self.variables = self._initial_variables
        self.steps = 0
        self.psnr_history.clear()

    def get_render_params(self):
        """Snapshot for the render thread (reference controller passthrough,
        controller.py:339-348)."""
        return self.variables, self.occ_states

    def save_runtime_checkpoint(self, path) -> None:
        """Lightweight runtime checkpoint {variables, steps, P-subset}
        (reference base.py:45-81)."""
        from acn_tpu.utils.checkpoint import save_checkpoint

        with io_lock:
            save_checkpoint(
                Path(path), "runtime", self.variables,
                occ_states=self.occ_states, P=self.P, step=self.steps,
            )

    def load_runtime_checkpoint(self, path) -> None:
        from acn_tpu.utils.checkpoint import load_checkpoint, restore_variables_like

        with io_lock:
            loaded = load_checkpoint(Path(path), "runtime")
        self.variables = restore_variables_like(self.variables, loaded["variables"])
        if loaded.get("occ_states") is not None and self.occ_states is not None:
            self.occ_states = restore_variables_like(
                self.occ_states, loaded["occ_states"]
            )
        self.steps = loaded["step"]

    def update_lr(self, group: str, value: float) -> None:
        self.lrs[group] = float(value)
        self._on_hparams_changed()

    def _on_hparams_changed(self) -> None:
        pass  # subclasses rebuild optimizers lazily

    # ---- to implement ----

    def step(self) -> Dict[str, float]:
        raise NotImplementedError


class ViewRunner(BaseRunner):
    """Render-only mode (reference base.py ViewRunner): no training work,
    but steps still count so Start-with-target terminates."""

    def step(self) -> Dict[str, float]:
        time.sleep(0.05)
        self.steps += 1
        return {"step": float(self.steps)}
