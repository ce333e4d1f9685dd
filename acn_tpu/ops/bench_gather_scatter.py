"""Hash-grid memory-op roofline microbenchmark.

The round-1 VERDICT requires either a Pallas hash-grid kernel or a
microbenchmark proving XLA's gather/scatter emitters are within ~1.2× of
what the hardware + available primitives can achieve. Mosaic cannot express
a large-table random row gather on this stack (see ops/hashgrid.py), so the
*achievable* alternatives to XLA's native emitters are:

* streaming copy           — the absolute HBM bandwidth ceiling (not
                             achievable for random access, context only);
* MXU one-hot matmul       — gather/scatter recast as `onehot @ table` /
                             `onehotᵀ @ grads`: flops scale with TABLE ROWS
                             × points, so it only competes for tiny tables;
* XLA gather / scatter-add — the native emitters this framework rides.

This script measures all three on the real chip and prints a JSON table.
Run: ``python -m acn_tpu.ops.bench_gather_scatter``
"""

from __future__ import annotations

import json
import os
import time


def _timed(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("ACN_TPU_COMPILATION_CACHE",
                       os.path.expanduser("~/.cache/acn_tpu_xla")),
    )
    import jax.numpy as jnp

    N = 4_000_000  # rows per op (≈ one episode render's per-level rows)
    results = {}

    for log2_rows, tag in ((13, "8k_rows_0.5MB"), (17, "131k_rows_8MB"),
                           (20, "1M_rows_67MB")):
        T = 2 ** log2_rows
        F = 16
        table = jax.random.normal(jax.random.PRNGKey(0), (T, F))
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)
        grads = jax.random.normal(jax.random.PRNGKey(2), (N, F))

        gather = jax.jit(lambda t, i: t[i])
        dt = _timed(gather, table, idx)
        results[f"gather_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

        scatter = jax.jit(
            lambda t, i, g: jnp.zeros_like(t).at[i].add(g)
        )
        dt = _timed(scatter, table, idx, grads)
        results[f"scatter_add_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

        # one-hot matmul alternative (the only other primitive that can
        # express a random-row gather): flops = N·T·F per pass
        if T <= 2 ** 13:
            onehot_gather = jax.jit(
                lambda t, i: jax.nn.one_hot(i, T, dtype=jnp.bfloat16)
                @ t.astype(jnp.bfloat16)
            )
            dt = _timed(onehot_gather, table, idx, iters=3)
            results[f"onehot_gather_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)
            onehot_scatter = jax.jit(
                lambda i, g: jax.nn.one_hot(i, T, dtype=jnp.bfloat16).T
                @ g.astype(jnp.bfloat16)
            )
            dt = _timed(onehot_scatter, idx, grads, iters=3)
            results[f"onehot_scatter_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

    # streaming ceiling: elementwise read+write of N×F f32
    x = jax.random.normal(jax.random.PRNGKey(3), (N, 16))
    stream = jax.jit(lambda a: a * 1.0001 + 0.1)
    dt = _timed(stream, x)
    results["stream_rw_GBps"] = round(2 * x.size * 4 / dt / 1e9, 1)
    results["stream_equiv_Mrows_per_s"] = round(N / dt / 1e6, 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
