"""Startup watchdog (utils/startup.py): wedge-bounded pre-loop phase.

The remote-TPU tunnel can wedge client creation or the checkpoint upload
before the trainer's loop watchdog arms; the startup watchdog converts
that into exit code 43 so supervise_train.sh relaunches.
"""

import subprocess
import sys
import time


def test_mark_ready_disarms():
    # fresh module state via a subprocess-free reload is fragile; drive the
    # real module but with a short fuse and disarm before it can fire
    import importlib

    from acn_tpu.utils import startup

    importlib.reload(startup)
    startup.arm(0.2, what="test", poll_s=0.05)
    startup.mark_ready()
    time.sleep(0.5)  # would have exited 43 by now if still armed


def test_timeout_exits_43():
    code = (
        "import time\n"
        "from acn_tpu.utils import startup\n"
        "startup.arm(0.3, what='wedged-test', poll_s=0.05)\n"
        "time.sleep(5)\n"
        "print('should not reach here')\n"
    )
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=30
    )
    assert proc.returncode == 43, (proc.returncode, proc.stdout, proc.stderr)
    assert "startup-watchdog" in proc.stdout
    assert time.monotonic() - t0 < 5  # exited at the fuse, not the sleep


def test_zero_timeout_disables():
    import importlib

    from acn_tpu.utils import startup

    importlib.reload(startup)
    startup.arm(0.0, poll_s=0.05)
    time.sleep(0.3)  # never fires
