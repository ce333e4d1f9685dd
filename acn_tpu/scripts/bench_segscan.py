"""Microbench: Pallas segmented-scan kernel vs XLA associative_scan.

Measures the packed-compositing prefix primitive (ops/segscan.py) at serving
scale on the current default device, validates pallas≡xla numerics on the
device first, and prints per-backend times + effective bandwidth.

Usage:
    python -m acn_tpu.scripts.bench_segscan [--sizes 1048576,4194304] [--iters 20]

The kernel's first on-hardware run should be this script (the axon relay was
down for all of round 4, so Mosaic compilation is unvalidated until then).
If numerics or compilation fail, production is unaffected: composite_packed
defaults to the XLA backend unless ACN_TPU_SEGSCAN=pallas is set.
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1048576,4194304")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mean_seg", type=int, default=24,
                    help="mean samples per ray segment")
    args = ap.parse_args()

    # fast-fail only when a PINNED relay endpoint refuses TCP (client
    # creation sleep-retries a refused endpoint forever); with no pinned
    # endpoint this is a no-op and the bounded run proceeds.
    if os.environ.get("JAX_PLATFORMS") == "axon":
        from acn_tpu.utils.relay import relay_tcp_down

        if relay_tcp_down():
            raise SystemExit(
                "[bench_segscan] pinned axon relay endpoint refused — "
                "external relay down; a jax client would hang forever."
            )

    cache = os.environ.get(
        "ACN_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/acn_tpu_xla")
    )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from acn_tpu.ops.segscan import seg_excl_sum

    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    for b in [int(s) for s in args.sizes.split(",")]:
        x = jnp.asarray(rng.normal(size=(b,)).astype(np.float32) * 23.0)
        starts = jnp.asarray(rng.random(b) < 1.0 / args.mean_seg).at[0].set(True)

        fns = {
            "xla": jax.jit(lambda x, s: seg_excl_sum(x, s, "xla")),
            "pallas": jax.jit(lambda x, s: seg_excl_sum(x, s, "pallas")),
        }
        outs, times = {}, {}
        for name, fn in fns.items():
            try:
                out = fn(x, starts)
                _ = float(out[-1])  # force through the tunnel
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(x, starts)
                _ = float(out[-1])
                dt = (time.perf_counter() - t0) / args.iters
                outs[name], times[name] = out, dt
            except Exception as e:  # Mosaic compile/runtime failure
                print(f"B={b:>9} {name:>6}: FAILED — {type(e).__name__}: {e}")
        if "xla" in outs and "pallas" in outs:
            err = float(jnp.max(jnp.abs(outs["xla"] - outs["pallas"])))
            rel = err / (float(jnp.max(jnp.abs(outs["xla"]))) + 1e-12)
            ok = "OK" if rel < 1e-5 else f"MISMATCH rel={rel:.2e}"
            print(f"B={b:>9} numerics: max|Δ|={err:.3e} ({ok})")
        for name, dt in times.items():
            gbps = 12 * b / dt / 1e9  # 2 f32 reads + 1 f32 write
            speed = ""
            if name == "pallas" and "xla" in times:
                speed = f"  ({times['xla'] / dt:.2f}x vs xla)"
            print(f"B={b:>9} {name:>6}: {dt * 1e3:8.3f} ms  {gbps:6.1f} GB/s{speed}")


if __name__ == "__main__":
    main()
