import os, time, faulthandler, signal
faulthandler.register(signal.SIGUSR1)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/acn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from acn_tpu.models.encodings import HashGridConfig, init_hash_table, hash_encode

def bench(dense):
    cfg = HashGridConfig(levels=16, min_res=16, max_res=1024,
                         log2_hashmap_size=16, layout="cell", dense_levels=dense)
    tab = init_hash_table(jax.random.PRNGKey(0), cfg)
    tab = jax.tree.map(lambda t: t.astype(jnp.bfloat16), tab)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256000, 3))
    g = jax.jit(jax.grad(lambda t, x: hash_encode(t, x, cfg).sum()))
    out = g(tab, x); jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0][0,0])
    t0 = time.perf_counter()
    for _ in range(8):
        out = g(tab, x)
    np.asarray(jax.tree.leaves(out)[0][0,0])
    dt = (time.perf_counter()-t0)/8
    print(f"dense={dense}: hash fwd+bwd 256k pts x16L: {dt*1e3:.1f} ms", flush=True)

bench(False)
bench(True)
