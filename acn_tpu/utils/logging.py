"""Logging: TensorBoard + timestamped log.txt with versioned run dirs.

Counterpart of the reference's ``Logger`` / ``MetricLogger``
(utils.py:28-203, 363-535): unique logdir versioning (``_v1, _v2, …``),
scalar/per-region logging, and windowed smoothed metrics for console output.
TensorBoard is optional (falls back to file-only logging if unavailable).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict, deque
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional


class Logger:
    def __init__(self, fname: str, logs_root: str = "logs", rank: int = 0):
        self.rank = rank
        logdir = Path(logs_root) / fname
        if logdir.exists() and any(logdir.iterdir()):
            v = 1
            while (Path(logs_root) / f"{fname}_v{v}").exists():
                v += 1
            logdir = Path(logs_root) / f"{fname}_v{v}"
        self.logdir = logdir
        if rank == 0:
            logdir.mkdir(parents=True, exist_ok=True)
            self._logfile = open(logdir / "log.txt", "a")
        else:
            self._logfile = None
        self._writer = None
        if rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=str(logdir))
            except Exception:
                self._writer = None

    def log(self, msg: str) -> None:
        if self.rank != 0:
            return
        stamp = datetime.now().strftime("%y-%m-%d %H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        if self._logfile:
            self._logfile.write(line + "\n")
            self._logfile.flush()

    def scalar(self, name: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(name, float(value), step)

    def scalars(self, prefix: str, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def add_region_layout(self, num_regions: int) -> None:
        """TensorBoard custom-scalars layout grouping per-region curves into
        multiline charts (reference Logger layouts, utils.py:105-169)."""
        if self._writer is None:
            return
        try:
            layout = {
                "per-region": {
                    metric: [
                        "Multiline",
                        [f"train/{metric}/region_{r}" for r in range(num_regions)],
                    ]
                    for metric in ("psnr_out", "loss_out")
                }
            }
            self._writer.add_custom_scalars(layout)
        except Exception:
            pass

    def image(self, name: str, img, step: int) -> None:
        """img: (H, W, 3) float [0,1] or uint8."""
        if self._writer is not None:
            import numpy as np

            arr = np.asarray(img)
            if arr.dtype != "uint8":
                arr = (arr.clip(0, 1) * 255).astype("uint8")
            self._writer.add_image(name, arr, step, dataformats="HWC")

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
        if self._logfile:
            self._logfile.close()


class SmoothedValue:
    """Windowed median/avg tracker (reference utils.py:363-430)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    def __str__(self):
        return f"{self.median:.4f} ({self.global_avg:.4f})"


class MetricLogger:
    """Console metric aggregator (reference utils.py:433-535)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def synchronize_between_processes(self) -> None:
        """All-reduce counts/totals across hosts so global_avg is the true
        multi-host mean (reference MetricLogger dist sync, utils.py:386-397,
        torch.distributed all_reduce → jax psum over processes)."""
        import jax

        if jax.process_count() <= 1:
            return
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        for m in self.meters.values():
            arr = jnp.asarray([float(m.count), float(m.total)])
            summed = multihost_utils.process_allgather(arr).sum(axis=0)
            m.count = int(summed[0])
            m.total = float(summed[1])


class PhaseTimer:
    """Wall-clock phase timing (data/step/misc), the reference's hand-rolled
    breakdown (meta_train_step.py:37-57) adapted to async dispatch: call
    ``tic(name)``/``toc(name)`` around host phases; jitted work is measured by
    blocking on the step outputs."""

    def __init__(self):
        self.acc = defaultdict(float)
        self._t0 = {}

    def tic(self, name: str):
        self._t0[name] = time.perf_counter()

    def toc(self, name: str):
        self.acc[name] += time.perf_counter() - self._t0.pop(name)

    def reset(self) -> Dict[str, float]:
        out = dict(self.acc)
        self.acc.clear()
        return out
