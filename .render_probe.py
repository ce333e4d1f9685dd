import time, types
import numpy as np, jax, jax.numpy as jnp
from acn_tpu.utils.checkpoint import load_checkpoint, restore_variables_like
from acn_tpu.runner import build_model_configs, build_occ_config
from acn_tpu.data.dataset import load_clustering_meta, load_coordinates, load_scene_boxes
from acn_tpu.utils.config import parse_args
from pathlib import Path

P = parse_args(["--op","eval","--configPath","configs/eval.json",
  "--checkpoint_path","qual400","--prefix","best","--use_amp"])
from acn_tpu.utils.checkpoint import resolve_checkpoint_dir
P.checkpoint_path = resolve_checkpoint_dir(P.checkpoint_path)
data_path = Path(P.data_path)/"out"/P.data_dirname
cp = load_clustering_meta(data_path/"masks"/P.mask_dirname)
ci = load_coordinates(data_path)
ga, ea = load_scene_boxes(data_path/"masks"/P.mask_dirname)
P.near = P.near/ci["pose_scale_factor"] if P.near is not None else None
P.far = P.far/ci["pose_scale_factor"] if P.far is not None else None
cfg = build_model_configs(P, cp)
occ_cfg = build_occ_config(P, ci["pose_scale_factor"])  # use_occ False in eval config? check
print("use_occ flag:", P.use_occ, "occ_cfg:", occ_cfg is not None)
from acn_tpu.models import container as cont
variables = cont.init_container(jax.random.PRNGKey(0), cfg,
    jnp.asarray(cp["centroids"]), jnp.asarray(ea), jnp.asarray(ga))
t0=time.time()
loaded = load_checkpoint(P.checkpoint_path, "best")
print(f"ckpt load {time.time()-t0:.1f}s; has occ: {loaded.get('occ_states') is not None}")
variables = restore_variables_like(variables, loaded["variables"])

from acn_tpu.occupancy import grid as og
from acn_tpu.occupancy.grid import OccConfig
occ_cfg2 = occ_cfg or OccConfig(near_plane=1e-3, far_plane=4.3)
occ_states = None
if loaded.get("occ_states") is not None:
    template = jax.vmap(lambda ab: og.init_occ_state(ab, occ_cfg2))(jnp.asarray(ea))
    occ_states = restore_variables_like(template, loaded["occ_states"])

from acn_tpu.pipelines.renderer import Renderer
r = Renderer(cfg, P, occ_cfg2)
print("chunk_rays:", r.chunk_rays)

# one chunk of rays straight down
N = r.chunk_rays
rng = np.random.default_rng(0)
o = np.concatenate([np.full((N,1),-0.04,np.float32),
                    rng.uniform(-0.8,0.8,(N,2)).astype(np.float32)],1)
o[:,0] = -0.04
d = np.tile(np.array([1.0,0,0],np.float32),(N,1))
rays = np.concatenate([o,d,np.full((N,1),0.0,np.float32),np.full((N,1),1.0,np.float32)],1)

for use_occ in ([True] if occ_states is not None else []) + [False]:
    t0=time.time()
    rgb, depth, acc = r.render_rays(variables, occ_states, rays, use_occ=use_occ)
    print(f"use_occ={use_occ} first call (compile+run): {time.time()-t0:.1f}s acc_mean={acc.mean():.3f}")
    t0=time.time()
    for _ in range(3):
        rgb, depth, acc = r.render_rays(variables, occ_states, rays, use_occ=use_occ)
    print(f"use_occ={use_occ} per-chunk: {(time.time()-t0)/3*1000:.0f} ms for {N} rays")
