"""Startup watchdog: bound the pre-training phase against tunnel wedges.

The trainer's loop watchdog (trainer.py) only arms once the training loop
starts. Everything before it — axon backend/client creation, the ~1.3 GB
checkpoint upload, ray-pool device_put — can wedge forever on the remote
TPU tunnel (observed 2026-08-17: two consecutive supervisor relaunch
attempts hung >30 min inside ``make_c_api_client`` with zero CPU, which no
loop watchdog could catch). This module arms a daemon thread at process
start that hard-exits with code 43 if :func:`mark_ready` is not called
within the timeout, so ``supervise_train.sh`` relaunches instead of
hanging the whole round.

Counterpart of the reference's implicit behavior: its CUDA runtime raises
on device loss instead of blocking, so the torch stack never needed this
(reference nerf_runner.py:1-60 has no equivalent guard).
"""

from __future__ import annotations

import os
import threading
import time

_STATE = {"ready": False, "armed": False}


def mark_ready() -> None:
    """Disarm the startup watchdog: startup made it to a supervised phase
    (the trainer's own loop watchdog, or an op that completed its device
    setup)."""
    _STATE["ready"] = True


def arm(timeout_s: float, what: str = "startup", poll_s: float = 15.0) -> None:
    """Arm the watchdog once per process; re-arming is a no-op.

    ``timeout_s <= 0`` disables. Exits the process with code 43 (distinct
    from the loop watchdog's 42, so supervisor logs attribute the wedge
    phase) when ``mark_ready`` hasn't been called within ``timeout_s``.
    """
    if timeout_s <= 0 or _STATE["armed"]:
        return
    _STATE["armed"] = True
    t0 = time.monotonic()

    def _watch():
        while not _STATE["ready"]:
            time.sleep(poll_s)
            if not _STATE["ready"] and time.monotonic() - t0 > timeout_s:
                print(
                    f"[startup-watchdog] {what} made no progress for "
                    f"{timeout_s:.0f}s — exiting 43 for supervisor relaunch",
                    flush=True,
                )
                os._exit(43)

    threading.Thread(target=_watch, daemon=True, name="startup-watchdog").start()
