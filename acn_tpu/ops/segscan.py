"""Pallas TPU kernel: segmented exclusive prefix-sum over packed samples.

The budget marching path packs every valid sample of a batch contiguously by
ray (occupancy/grid.py ``march_rays_budget``), and compositing then needs the
segment-exclusive prefix sum of per-sample log-transmittance — the reset-at-
ray-start scan of ``composite_packed`` (nerfs/render.py). The reference gets
the equivalent quantity from nerfacc's fused CUDA ``render_weight_from_density``
over its packed buffers (reference nerfs/ray_rendering.py:477-481).

``jax.lax.associative_scan`` is the XLA spelling, but it lowers to a
log-depth tree: ~2·log2(B) elementwise passes over the (B,) buffer, each a
round-trip through HBM. At serving scale (B ≈ 10⁶ packed samples per chunk)
the op is pure memory traffic, so the tree costs ~20× the streaming minimum.

This kernel does the whole scan in ONE pass over HBM, which is the roofline
for the op:

* the packed buffer is viewed as (G·R, 128) and the grid walks G blocks of
  (R, 128) float32 in VMEM;
* within a block, a segmented Hillis–Steele scan runs along lanes (7 shifted
  adds) and then along sublanes (log2(R) shifted adds) — all VPU work on
  VMEM-resident tiles, no HBM re-reads;
* the running carry of the last open segment crosses grid steps through an
  SMEM scratch cell. TPU Pallas grids execute sequentially on a core, which
  makes the cross-block recurrence exact (same pattern as accumulation
  kernels; see the double-buffering section of the Pallas guide).

Segmented combine (associative, non-commutative):
    (va, fa) • (vb, fb) = (vb + (1-fb)·va, fa ∨ fb)
where f marks "a segment boundary lies inside the scanned window". Flags are
carried as float32 0/1 — Mosaic vector ops on bools are not portable.

The backward pass is the same kernel run on the reversed buffer: the
transpose of a segment-exclusive forward sum is a segment-exclusive REVERSE
sum with boundaries shifted to segment ends, so ``seg_excl_sum`` is a
``jax.custom_vjp`` that calls itself on ``g[::-1]``.

Dispatch: ``seg_excl_sum(x, seg_start, backend=...)`` with backends
  * ``"xla"``       — the associative_scan spelling (default off-TPU, and
                      the production fallback via ``ACN_TPU_SEGSCAN=xla``);
  * ``"pallas"``    — the Mosaic kernel (default on real TPU since the
                      on-chip validation: fwd microbench 2.2–5.9× vs XLA +
                      pixel-identical serving frame, bwd through the full
                      budget-regime meta-train step — BASELINE.md r5/r6);
  * ``"interpret"`` — the same kernel body in the Pallas interpreter (CPU
                      test suites);
  * ``"auto"``      — honors ``ACN_TPU_SEGSCAN`` env var, else pallas on
                      TPU / xla elsewhere (see ``resolve_backend``).
``scripts/bench_segscan.py`` measures pallas-vs-xla on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports fail on some CPU-only stacks; the kernel still works
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

LANES = 128


def _shift_down(v, d, axis):
    """v_{i-d} with zero fill — circular ``pltpu.roll`` + iota mask.

    First on-chip run (round 5) showed the zeros-concat spelling does NOT
    compile: Mosaic rejects ``tpu.concatenate`` whose operands carry
    different sublane/lane offsets ("result/input offset mismatch on
    non-concat dimension") — the offset-d slice can't be concatenated with
    a freshly-materialized zeros block. ``tpu.dynamic_rotate`` (what roll
    lowers to) has no such operand-layout constraint, and the zero fill
    becomes a branch-free ``where`` against an iota, which Mosaic lowers
    natively. Works identically in interpret mode (validated vs numpy)."""
    if d == 0:
        return v
    rolled = pltpu.roll(v, d, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    return jnp.where(idx >= d, rolled, jnp.zeros_like(v))


def _seg_scan_kernel(x_ref, f_ref, out_ref, carry_ref, *, rows):
    """One (rows, 128) block: segmented INCLUSIVE scan, then convert to
    exclusive and add the cross-block carry."""
    # reset carry at the first grid step
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0] = 0.0

    x = x_ref[:].astype(jnp.float32)
    f = f_ref[:].astype(jnp.float32)

    # --- segmented Hillis–Steele along lanes (within each sublane row) ---
    v, g = x, f
    d = 1
    while d < LANES:
        v = v + (1.0 - g) * _shift_down(v, d, axis=1)
        g = jnp.minimum(g + _shift_down(g, d, axis=1), 1.0)
        d *= 2

    # --- combine across sublane rows, at FULL lane width ---
    # Row summaries live in the last lane; rotate it to lane 0 (offset-0
    # layout) and broadcast across lanes — the softmax-normalizer pattern
    # Mosaic handles natively. Narrow (rows,1) arithmetic is avoided
    # entirely: every op below is (rows, LANES), trading 127 redundant
    # lanes of VPU work (free — the op is memory-bound) for layouts with
    # no sublane/lane offset hazards.
    t = jnp.broadcast_to(pltpu.roll(v, 1, 1)[:, :1], v.shape)
    b = jnp.broadcast_to(pltpu.roll(g, 1, 1)[:, :1], g.shape)
    it, ib = t, b
    d = 1
    while d < rows:
        it = it + (1.0 - ib) * _shift_down(it, d, axis=0)
        ib = jnp.minimum(ib + _shift_down(ib, d, axis=0), 1.0)
        d *= 2

    # carry entering row r = carried inclusive row-scan at row r-1. The
    # cross-block carry rides along wherever no boundary has intervened:
    # I_r = it_r + (1−ib_r)·chunk_carry, and carry_col_r = I_{r−1} with
    # I_{−1} = chunk_carry (the r=0 case falls out of the zero-filled shift).
    chunk_carry = carry_ref[0]
    carry_col = _shift_down(it, 1, axis=0) + (
        1.0 - _shift_down(ib, 1, axis=0)
    ) * chunk_carry

    incl = v + (1.0 - g) * carry_col  # broadcast over lanes
    out_ref[:] = incl - x  # exclusive = inclusive − self

    # carry leaving this block = carried inclusive row-scan at the last
    # row. Extract it as a masked full-array max — every lane of a row in
    # ``it``/``ib`` holds the same value, and max over {value, -inf} is
    # exact — instead of a scalar vector-extract, whose (1,1) strided-
    # slice layout is another Mosaic offset hazard.
    rowid = jax.lax.broadcasted_iota(jnp.int32, it.shape, 0)
    is_last = rowid == (rows - 1)
    neg = jnp.float32(-jnp.inf)
    last_t = jnp.max(jnp.where(is_last, it, neg))
    last_b = jnp.max(jnp.where(is_last, ib, neg))
    carry_ref[0] = last_t + (1.0 - last_b) * chunk_carry


def _seg_excl_sum_pallas(x, seg_start, *, rows=64, interpret=False):
    """Segment-exclusive prefix sum of ``x`` (1-D) with resets where
    ``seg_start`` — single-pass Pallas kernel. Static shapes only."""
    (b,) = x.shape
    block = rows * LANES
    g = -(-b // block)  # cdiv
    pad = g * block - b
    xf = jnp.pad(x.astype(jnp.float32), (0, pad))
    # padding elements are their own segments: the carry chain stays exact
    ff = jnp.pad(seg_start.astype(jnp.float32), (0, pad), constant_values=1.0)
    x2 = xf.reshape(g * rows, LANES)
    f2 = ff.reshape(g * rows, LANES)

    if not _HAVE_PLTPU:  # pragma: no cover - CPU stacks without pltpu
        raise RuntimeError("pallas TPU backend unavailable")
    kernel = functools.partial(_seg_scan_kernel, rows=rows)
    if interpret:
        spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0))
    else:
        spec = pl.BlockSpec(
            (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    kwargs = {}
    if not interpret:
        # the cross-block carry REQUIRES in-order grid execution: mark the
        # grid dim "arbitrary" (sequential) so Mosaic never splits it across
        # cores on multi-core chips (v5e is single-core; v4/v5p are not)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g * rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(x2, f2)
    return out.reshape(-1)[:b]


def _seg_excl_sum_xla(x, seg_start):
    """The associative_scan spelling (nerfs/render.py's original path)."""

    def _op(a, c):
        va, fa = a
        vb, fb = c
        return jnp.where(fb, vb, va + vb), fa | fb

    incl, _ = jax.lax.associative_scan(
        _op, (x.astype(jnp.float32), seg_start.astype(bool))
    )
    return incl - x.astype(jnp.float32)


def resolve_backend(backend: str = "auto") -> str:
    """"auto" → env override if set, else the Mosaic kernel on real TPU
    (validated on-chip round 5/6: forward microbench 2.2–5.9× vs the XLA
    scan + pixel-identical e2e serving frame; backward through the full
    budget-regime meta-train step at flagship scale — BASELINE.md), XLA
    elsewhere (CPU test suites run the kernel via "interpret" explicitly).
    ``ACN_TPU_SEGSCAN=xla`` remains the production fallback switch."""
    if backend == "auto":
        backend = os.environ.get("ACN_TPU_SEGSCAN", "")
        if not backend:
            try:
                import jax

                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            backend = "pallas" if (on_tpu and _HAVE_PLTPU) else "xla"
    if backend not in ("xla", "pallas", "interpret"):
        raise ValueError(f"unknown segscan backend {backend!r}")
    return backend


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def seg_excl_sum(x, seg_start, backend="auto"):
    """excl_i = Σ_{j<i, same segment} x_j  (resets where seg_start).

    ``seg_start`` must be True at index 0. Differentiable in ``x``.

    The "auto" backend reads ``ACN_TPU_SEGSCAN`` at TRACE time and the
    choice is baked into jit caches (including Renderer._jitted): changing
    the env var mid-process does not retrace already-compiled shapes. A/B
    the backends in fresh processes (or fresh Renderer instances), as
    ``scripts/bench_segscan.py`` does.
    """
    backend = resolve_backend(backend)
    if backend == "xla":
        return _seg_excl_sum_xla(x, seg_start)
    return _seg_excl_sum_pallas(x, seg_start, interpret=backend == "interpret")


def _fwd(x, seg_start, backend):
    return seg_excl_sum(x, seg_start, backend), seg_start


def _bwd(backend, seg_start, g):
    # transpose of the forward: grad_j = Σ_{i>j, same segment} g_i — the
    # segment-exclusive REVERSE sum, with boundaries at segment ENDS. After
    # reversal, position k corresponds to j = B-1-k and the segment "starts"
    # (in reversed order) where the original segment ends: end_j =
    # seg_start_{j+1} (or j = B-1).
    end = jnp.concatenate(
        [seg_start[1:], jnp.ones((1,), seg_start.dtype)], axis=0
    )
    grad = seg_excl_sum(g[::-1], end[::-1], backend)[::-1]
    return (grad, None)


seg_excl_sum.defvjp(_fwd, _bwd)
