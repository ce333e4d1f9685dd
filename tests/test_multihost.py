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

# ---- one REAL cross-process expert-sharded meta-train step (VERDICT r4
# weak item 7: expert sharding was only ever proven single-process). K=2
# experts over 2 processes, one expert per host device; the outer psum
# crosses the process boundary through the gloo collectives.
import types
import jax.numpy as jnp

sys.path.insert(0, os.getcwd())
from __graft_entry__ import _toy_problem
from acn_tpu.models import container as cont
from acn_tpu.parallel.mesh import shard_by_expert_axis
from acn_tpu.pipelines.offline_stage.train_step import make_meta_train_step
from acn_tpu.pipelines.offline_stage.trainer import dummy_occ_states
from acn_tpu.utils.optim import build_optimizer

K, T, S, Q = 2, 1, 32, 16
cfg, variables = _toy_problem(K=K, hash_log2=8, hash_levels=2)
mesh2 = make_mesh(K, mesh_experts=2, mesh_data=1)
P2 = types.SimpleNamespace(
    algo="fomaml", inner_iter=2, inner_lr=0.01, ray_samples=8,
    color_space="linear", bg_color_default="white", optimizer="adam",
    encoding_lr=1e-2, sigma_lr=2e-3, color_lr=2e-3, bg_lr=1e-3, lr=1e-4,
    outer_steps=10, decay_factor=10.0, no_scheduler=False, grad_clip=1.0,
    occ_s_max=16, occ_s_kept=8,
)
labels = cont.param_group_labels(variables, cfg)
opt = build_optimizer(P2, labels, grad_clip=P2.grad_clip)
step_fn = jax.jit(make_meta_train_step(cfg, P2, opt))
state = {
    "variables": variables,
    "opt_state": opt.init(variables["params"]),
    "step": jnp.zeros((), jnp.int32),
}
state = shard_by_expert_axis(state, mesh2, K)
occ = shard_by_expert_axis(dummy_occ_states(K), mesh2, K)

rng = np.random.default_rng(0)
o = np.concatenate(
    [rng.uniform(-0.5, 0.5, (K, T, S + Q, 2)).astype(np.float32),
     np.full((K, T, S + Q, 1), 2.0, np.float32)], axis=-1)
d = np.tile(np.array([0, 0, -1], np.float32), (K, T, S + Q, 1))
nf = np.concatenate(
    [np.full((K, T, S + Q, 1), 1.0, np.float32),
     np.full((K, T, S + Q, 1), 3.0, np.float32)], axis=-1)
batch = {
    "support_rays": np.concatenate([o, d, nf], -1)[:, :, :S],
    "support_rgbs": np.full((K, T, S, 3), 0.5, np.float32),
    "query_rays": np.concatenate([o, d, nf], -1)[:, :, S:],
    "query_rgbs": np.full((K, T, Q, 3), 0.5, np.float32),
}
batch = shard_by_expert_axis({k: jnp.asarray(v) for k, v in batch.items()},
                             mesh2, K)
new_state, metrics = step_fn(state, batch, occ, jax.random.PRNGKey(0))
loss0 = float(metrics["loss_total"])
assert np.isfinite(loss0), loss0
_, metrics2 = step_fn(new_state, batch, occ, jax.random.PRNGKey(1))
loss1 = float(metrics2["loss_total"])
assert np.isfinite(loss1) and loss1 < loss0, (loss0, loss1)
# the replicated global loss must agree across BOTH processes bit-for-bit
agree = multihost_utils.process_allgather(np.array([loss0, loss1], np.float64))
assert np.allclose(agree[0], agree[1], rtol=0, atol=0), agree
print(f"proc {jax.process_index()} OK loss {loss0:.5f}->{loss1:.5f}", flush=True)
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
