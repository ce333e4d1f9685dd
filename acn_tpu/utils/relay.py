"""Axon-relay health probing shared by bench/supervisor entry points.

Round-4 history: the external relay outage wedged new jax client creation
forever (make_c_api_client sleep-retries a refused TCP connect), so every
chip entry point grew a fast TCP pre-filter on 127.0.0.1:10000. Round-5
environment change: the relay no longer listens on a fixed well-known port
(no ``AXON_POOL_SVC_OVERRIDE``; a local pool process owns a dynamic port
range), so "port 10000 refused" stopped meaning "relay down" — it nearly
cost the round by fast-failing against a healthy TPU.

Policy now:

* the TCP pre-filter is only **decisive** when the environment names the
  relay endpoint (``AXON_POOL_SVC_OVERRIDE=host:port``): refused ⇒ down.
* otherwise the TCP check is skipped entirely and health is decided by a
  **bounded** ``jax.devices()`` probe in a throwaway subprocess — a wedge
  costs one timeout, never a hang.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Optional


def relay_endpoint() -> Optional[tuple]:
    """(host, port) of the relay if the environment pins one, else None."""
    ov = os.environ.get("AXON_POOL_SVC_OVERRIDE", "")
    if ":" in ov:
        host, _, port = ov.rpartition(":")
        try:
            return host or "127.0.0.1", int(port)
        except ValueError:
            return None
    return None


def relay_tcp_down() -> bool:
    """True ONLY when a pinned relay endpoint actively refuses TCP.

    Unknown endpoint (the common case now) ⇒ False: callers must fall
    through to the bounded client probe instead of fast-failing.
    """
    ep = relay_endpoint()
    if ep is None:
        return False
    s = socket.socket()
    s.settimeout(3.0)
    try:
        s.connect(ep)
        return False
    except OSError:
        return True
    finally:
        s.close()


def probe_backend(timeout_s: float) -> bool:
    """Bounded device-client health probe in a throwaway subprocess."""
    if os.environ.get("JAX_PLATFORMS") == "axon" and relay_tcp_down():
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
