"""Two-process ``jax.distributed`` smoke test (SURVEY §4 / §5).

The 8-device single-process CPU mesh used by the rest of the suite never
crosses a process boundary; this test does — it spawns two real OS processes
that rendezvous through ``maybe_init_distributed`` (acn_tpu/parallel/mesh.py)
on a localhost coordinator, then run a global collective across both, exactly
the path a TPU pod takes per host (minus ICI).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

CHILD = r"""
import os, sys
# the axon sitecustomize pins JAX_PLATFORMS=axon — force CPU the same way
# tests/conftest.py does (env alone is not enough once jax imports)
os.environ["JAX_PLATFORMS"] = "cpu"
import argparse
import jax
jax.config.update("jax_platforms", "cpu")
# multiprocess CPU runtime: the CPU client only spans processes when built
# with a cross-process collectives implementation
jax.config.update("jax_cpu_collectives_implementation", "gloo")
if jax._src.xla_bridge._backends:
    import jax.extend.backend as jeb
    jeb.clear_backends()
import numpy as np

from acn_tpu.parallel.mesh import maybe_init_distributed

P = argparse.Namespace(
    coordinator_address=sys.argv[1],
    process_id=int(sys.argv[2]),
    num_processes=2,
)
assert maybe_init_distributed(P), "distributed init returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()  # one CPU device per proc

# one real cross-process collective: allgather each process's contribution
from jax.experimental import multihost_utils

mine = np.array([float(jax.process_index() + 1)], np.float32)
all_vals = multihost_utils.process_allgather(mine)
total = float(np.sum(all_vals))
assert total == 3.0, total  # 1 + 2

# the (expert, data) mesh lays out over the GLOBAL device set
from acn_tpu.parallel.mesh import make_mesh

mesh = make_mesh(num_experts=4, mesh_experts=2, mesh_data=1)
assert mesh is not None and mesh.devices.size == 2, mesh
print(f"proc {jax.process_index()} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # children must not inherit the suite's forced 8-device flag: process
    # boundaries are the point here, one device per process
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
