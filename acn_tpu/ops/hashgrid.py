"""Hash-grid kernel engineering notes and dispatch hooks.

The reference's performance core is tiny-cuda-nn's fused CUDA hash-grid
kernel (reference models/encodings.py:229-256). On GPUs, per-thread random
shared/L2 memory access is nearly free, so 8 corner lookups per (point,
level) are fine. The TPU memory system is different, and we measured it
(v5e, one chip, XLA 0.9 via remote tunnel):

============================  measured characteristics  =====================
matmul 8k³ bf16                      123 TFLOPS (62% of peak)
elementwise r+w                      ~250 GB/s
gather (T, F) rows, F ∈ {2…32}       ~220–360 M rows/s — ROW-COUNT-BOUND,
                                     independent of row width and table size
scatter-add into 67 MB table          ~10 M rows/s
scatter-add into ≤8 MB table          59–126 M rows/s (VMEM-resident accum)
per-ray argsort compaction           439 s XLA compile (!) → replaced by
                                     cumsum+dropping-scatter (compiles in s)
=============================================================================

Consequences (implemented in ``acn_tpu.models.encodings``):

1. **Cell-packed layout** (``HashGridConfig.layout = "cell"``): one gathered
   row per (point, level) carrying all 8 corner features — 8× fewer gather
   AND scatter rows than the classic corner layout at equal feature payload.
2. **Per-level tables**: autodiff emits one scatter per table array; keeping
   each level's table ≤ ~8 MB keeps the grad accumulation in VMEM (6–12×).
3. bf16 AMP for the gather/matmul path (fp32 masters).

**Why there is no Pallas kernel here.** Pallas/Mosaic on this stack cannot
express a large-table random row gather:

* direct int indexing of a VMEM ref raises "Cannot do int indexing on TPU";
* ``lax.gather`` lowers only to ``tpu.dynamic_gather`` for
  take_along_axis-style batched gathers with operand-shaped indices, and the
  Mosaic backend crashed compiling even an (8192, 16) instance — the
  hardware primitive is a vreg-local shuffle, not a table lookup;
* per-row DMA (``make_async_copy(table.at[idx], …)`` per row) is
  expressible but issue-latency-bound: each descriptor costs ~µs of
  scalar-core + DMA-engine setup, capping a row-per-DMA kernel at well
  under ~1M rows/s — two orders of magnitude below XLA's gather emitter;
* the Pallas TPU programming guide's documented memory-access surface
  (re-checked round 4) is block refs, ``pl.ds`` dynamic *slices*, and
  masked load/store — there is no per-lane vector gather/scatter
  primitive to build on.

And the XLA emitter is already at the *true* roofline for this access
pattern: random 8–64 B rows are HBM-transaction-granularity-bound (one
~512 B transaction per touched row regardless of row width — which is
exactly why the measured rate is row-count-bound and width-independent).
220–360 M rows/s × 512 B/transaction ≈ 110–185 GB/s of raw transaction
traffic against ~250 GB/s of stream bandwidth: there is no >2× latent in a
hand-written kernel; the wins live in ROW COUNT (the layout work above)
and row locality, not in the lookup loop. A future SparseCore-equipped
platform (or Mosaic gaining real VMEM gathers) would slot in under
``HashGridConfig.backend = "pallas"`` via this module.

Where Pallas DOES pay on this pipeline is the other packed-path primitive:
the segment-exclusive transmittance scan of ``composite_packed``, whose XLA
spelling (``lax.associative_scan``) costs ~2·log2(B) HBM passes. That kernel
— blocked segmented Hillis–Steele with a sequential SMEM carry across grid
steps, one HBM pass total — lives in ``acn_tpu.ops.segscan`` and is wired
behind ``ACN_TPU_SEGSCAN=pallas`` (``scripts/bench_segscan.py`` measures it).
"""

from __future__ import annotations

# Measured v5e single-chip characteristics behind the design above
# (remote-tunnel, XLA 0.9; re-measure with ops/bench_gather_scatter.py).
# Units: rows/s bands are (low, high); bandwidths in GB/s; FLOPs in TFLOPS.
MEASURED_V5E = {
    "matmul_bf16_tflops": 123.0,
    "elementwise_hbm_gbps": 250.0,
    "gather_rows_per_s": (220e6, 360e6),  # row-count-bound, width-independent
    "scatter_add_rows_per_s_small_table": (59e6, 126e6),  # ≤8 MB, VMEM accum
    "scatter_add_rows_per_s_large_table": (10e6, 25e6),  # 67 MB, HBM accum
    "hbm_transaction_bytes": 512,  # why gathers are row-count-bound
}
