"""Hash-grid memory-op roofline microbenchmark.

The round-1 VERDICT requires either a Pallas hash-grid kernel or a
microbenchmark proving XLA's gather/scatter emitters are within ~1.2× of
what the hardware + available primitives can achieve. Mosaic cannot express
a large-table random row gather on this stack (see
docs/hashgrid_kernel_memo.md), so the *achievable* alternatives to XLA's
native emitters are:

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

# Measured v5e single-chip characteristics — the design basis behind the
# cell-packed hash layout (docs/hashgrid_kernel_memo.md). Remote-tunnel,
# XLA 0.9; re-measure by running this module on the chip.
# Units: rows/s bands are (low, high); bandwidths in GB/s; FLOPs in TFLOPS.
MEASURED_V5E = {
    "matmul_bf16_tflops": 123.0,
    "elementwise_hbm_gbps": 250.0,
    "gather_rows_per_s": (220e6, 360e6),  # row-count-bound, width-independent
    "scatter_add_rows_per_s_small_table": (59e6, 126e6),  # ≤8 MB, VMEM accum
    "scatter_add_rows_per_s_large_table": (10e6, 25e6),  # 67 MB, HBM accum
    "hbm_transaction_bytes": 512,  # why gathers are row-count-bound
}


def _timed(fn, *args, iters=10):
    """Time ``iters`` executions with ITERATION-DEPENDENT inputs.

    Repeating an identical (fn, args) call on this remote backend gets
    result-cached — a naive loop measured 15 TB/s of "HBM bandwidth"
    (hardware peak is ~0.8). ``fn`` must take a trailing int salt that
    perturbs its inputs; the loop runs inside one jitted lax.scan so
    per-call tunnel latency doesn't pollute the measurement either.
    """
    import jax
    import jax.numpy as jnp

    def loop(_args):
        def body(carry, i):
            out = fn(*_args, i)
            # fold a scalar of the output into the carry so nothing is DCE'd
            leaf = out if not isinstance(out, tuple) else out[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters)
        )
        return acc

    looped = jax.jit(loop)
    jax.block_until_ready(looped(args))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(looped(args))
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

        def gather(t, i, salt):
            return t[(i + salt) % T]

        dt = _timed(gather, table, idx)
        results[f"gather_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

        def scatter(t, i, g, salt):
            return jnp.zeros_like(t).at[(i + salt) % T].add(g)

        dt = _timed(scatter, table, idx, grads)
        results[f"scatter_add_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

        # one-hot matmul alternative (the only other primitive that can
        # express a random-row gather): flops = N·T·F per pass
        if T <= 2 ** 13:
            def onehot_gather(t, i, salt):
                oh = jax.nn.one_hot((i + salt) % T, T, dtype=jnp.bfloat16)
                return oh @ t.astype(jnp.bfloat16)

            dt = _timed(onehot_gather, table, idx, iters=3)
            results[f"onehot_gather_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

            def onehot_scatter(i, g, salt):
                oh = jax.nn.one_hot((i + salt) % T, T, dtype=jnp.bfloat16)
                return oh.T @ g.astype(jnp.bfloat16)

            dt = _timed(onehot_scatter, idx, grads, iters=3)
            results[f"onehot_scatter_{tag}_Mrows_per_s"] = round(N / dt / 1e6, 1)

    # streaming ceiling: elementwise read+write of N×F f32
    x = jax.random.normal(jax.random.PRNGKey(3), (N, 16))

    def stream(a, salt):
        return a * 1.0001 + salt.astype(jnp.float32)

    dt = _timed(stream, x)
    results["stream_rw_GBps"] = round(2 * x.size * 4 / dt / 1e9, 1)
    results["stream_equiv_Mrows_per_s"] = round(N / dt / 1e6, 1)

    # compare against the recorded design-basis bands (MEASURED_V5E above) so
    # a platform/runtime change that shifts the roofline is visible
    lo, hi = MEASURED_V5E["gather_rows_per_s"]
    g = results.get("gather_131k_rows_8MB_Mrows_per_s", 0.0) * 1e6
    results["gather_vs_design_basis"] = (
        "in-band" if lo * 0.8 <= g <= hi * 1.25 else
        f"OUT OF BAND (basis {lo / 1e6:.0f}-{hi / 1e6:.0f} M rows/s)"
    )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
