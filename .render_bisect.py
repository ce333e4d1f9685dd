import time, types
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _toy_problem
from acn_tpu.models import container as cont

def bench(fn, *args, iters=3, warm=1):
    for _ in range(warm): r = fn(*args)
    _ = float(jax.tree.leaves(r)[0].ravel()[0])
    t0=time.perf_counter()
    for _ in range(iters): r = fn(*args)
    _ = float(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter()-t0)/iters*1000

cfg, variables = _toy_problem(K=4, hash_log2=17, hash_levels=16)
M = 1_000_000
xd = jax.random.normal(jax.random.PRNGKey(1), (M, 6), jnp.float32) * 0.4

# 1. single expert on M points
e0 = jax.tree.map(lambda a: a[0], variables["params"]["experts"])
ab = variables["buffers"]["expert_aabbs"][0]
f1 = jax.jit(lambda p, x: jnp.sum(cfg.expert_forward(p, cfg.expert, ab, x)))
print(f"single expert fwd {M} pts: {bench(f1, e0, xd):.0f} ms")

# 2. full container (vmap all experts + blend)
f2 = jax.jit(lambda v, x: jnp.sum(cont.container_forward(v, cfg, x)))
print(f"container fwd {M} pts: {bench(f2, variables, xd):.0f} ms")

# 3. vmap experts only (no routing blend)
def vex(v, x):
    ys = jax.vmap(lambda p, a: cfg.expert_forward(p, cfg.expert, a, x))(
        v["params"]["experts"], v["buffers"]["expert_aabbs"])
    return jnp.sum(ys)
f3 = jax.jit(vex)
print(f"vmapped 4 experts {M} pts: {bench(f3, variables, xd):.0f} ms")

# 4. routing weights only
f4 = jax.jit(lambda v, x: jnp.sum(cont.routing_weights(v["buffers"]["centroids"], x[:, :3], cfg.cluster_2d, cfg.boundary_margin)))
print(f"routing {M} pts: {bench(f4, variables, xd):.0f} ms")
