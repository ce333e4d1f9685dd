"""Measure coarse_ray_range tightening on a trained run's occupancy grids.

Hardware-free preview of the serving march savings (BASELINE round-4
section): median per-ray tightened-range fraction over real val-view
cameras against each expert's restored grid. Rerun on the finished
flagship checkpoint - the step-60 grids are still diffuse (~28%%
occupied) and understate the converged savings.

Usage: python -m acn_tpu.scripts.measure_coarse_range [run_dir] [prefix]
"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from pathlib import Path

from acn_tpu.utils.checkpoint import load_checkpoint_with_fallback
from acn_tpu.data.dataset import get_image_metadata, load_scene_boxes
from acn_tpu.data.ray_prep import get_ray_directions_np, get_rays_np
from acn_tpu.occupancy.grid import coarse_ray_range

run = sys.argv[1] if len(sys.argv) > 1 else "logs/r3_flagship"
prefix = sys.argv[2] if len(sys.argv) > 2 else "last"
loaded, _ = load_checkpoint_with_fallback(run, prefix)
occ = loaded["occ_states"]
print("occ occupied per expert:",
      [f"{np.asarray(occ['binaries'][k]).mean():.1%}" for k in range(4)])

data_path = Path("data/drz/out/example")
ga, ea = load_scene_boxes(data_path / "masks" / "g22_grid_bm110_ss11")
train_meta, val_meta = get_image_metadata(data_path, 0.25)
print("val views:", len(val_meta))

rng = np.random.default_rng(0)
fracs, hits = [], []
for vi in (0, len(val_meta) // 2, len(val_meta) - 1):
    md = val_meta[vi]
    H, W = md.H, md.W
    fx, fy, cx, cy = np.asarray(md.intrinsics[:4], np.float64)
    dirs = get_ray_directions_np(H, W, fx, fy, cx, cy)
    ys = rng.integers(0, H, 4000); xs = rng.integers(0, W, 4000)
    rays = get_rays_np(dirs[ys, xs], np.asarray(md.c2w), aabb=np.asarray(ga))
    near = np.maximum(rays[:, 6], 1e-3)
    far = np.maximum(rays[:, 7], near)
    span = far - near
    ok = span > 1e-6
    for k in range(4):
        st_k = {"aabbs": jnp.asarray(occ["aabbs"][k]),
                "binaries": jnp.asarray(occ["binaries"][k])}
        n2, f2 = coarse_ray_range(
            st_k, jnp.asarray(rays[:, :3]), jnp.asarray(rays[:, 3:6]),
            jnp.asarray(near), jnp.asarray(far), s_coarse=32)
        n2, f2 = np.asarray(n2), np.asarray(f2)
        frac = (f2 - n2) / np.maximum(span, 1e-9)
        fracs.append(np.median(frac[ok]))
        hits.append(((f2 > n2) & ok)[ok].mean())
print("median tightened fraction per (view,expert):",
      [f"{f:.2f}" for f in fracs])
print("mean frac:", f"{np.mean(fracs):.3f}", "mean hit-rate:",
      f"{np.mean(hits):.2f}")
