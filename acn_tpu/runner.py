"""Unified entry point: build context + dispatch ops.

Counterpart of the reference's ``nerf_runner.py``: ``build_context(P, op)``
loads clustering meta + scene boxes, constructs the expert container, and per
op builds the episodic samplers + optimizer (train), the metadata eval loader
+ checkpoint (eval/video), or the viewer context (view)
(reference nerf_runner.py:47-290).

Deviation from the reference: its hash-encoding config silently ignores the
``--log2_hashmap_size``/``--max_res`` flags (build_context reads nonexistent
``high_*`` attrs with hard-coded defaults, nerf_runner.py:102-109); here the
flags are wired for real.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax

# Persistent compilation cache: first-compile of the fully-fused meta step is
# expensive (and the remote-TPU tunnel adds variance); cache across processes.
_cache_dir = os.environ.get(
    "ACN_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/acn_tpu_xla")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from acn_tpu.data.dataset import (
    get_dataset,
    get_image_metadata,
    load_clustering_meta,
    load_coordinates,
    load_scene_boxes,
)
from acn_tpu.data.tasks import MultiTaskSampler, TaskSampler
from acn_tpu.models import container as cont
from acn_tpu.models.container import ContainerConfig
from acn_tpu.models.encodings import HashGridConfig
from acn_tpu.models.ngp import NGPConfig
from acn_tpu.models.vanilla import VanillaConfig
from acn_tpu.occupancy import grid as occ_grid
from acn_tpu.occupancy.grid import OccConfig
from acn_tpu.parallel.mesh import make_mesh
from acn_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_with_fallback,
    load_opt_state,
    resolve_checkpoint_dir,
    restore_variables_like,
)
from acn_tpu.utils.config import parse_args
from acn_tpu.utils.logging import Logger
from acn_tpu.utils.optim import build_optimizer


def build_model_configs(P, clustering_params) -> ContainerConfig:
    """args → model configuration (reference nerf_runner.py:102-169).

    ``--log2_hashmap_size`` keeps its reference meaning (log2 of per-level
    parameter slots); the TPU-native cell layout packs 8 corner features per
    row, so its row count is 2^(log2−3) for equal capacity.
    """
    layout = getattr(P, "hash_layout", "cell")
    log2 = int(P.log2_hashmap_size) - (3 if layout == "cell" else 0)
    hash_cfg = HashGridConfig(
        levels=int(getattr(P, "hash_levels", 16)),
        min_res=16,
        max_res=int(P.max_res),
        log2_hashmap_size=max(log2, 4),
        features_per_level=int(getattr(P, "hash_features", 2)),
        interpolation="Linear",
        backend=getattr(P, "hash_backend", "auto"),
        layout=layout,
        dense_levels=bool(getattr(P, "hash_dense_levels", False)),
    )
    if P.nerf_variant == "instant":
        expert_cfg = NGPConfig(
            hidden=P.dim_hidden,
            sigma_depth=P.sigma_depth,
            color_hidden=P.color_hidden,
            color_depth=P.color_depth,
            dir_encoding=P.dir_encoding,
            hash=hash_cfg,
        )
    else:
        expert_cfg = VanillaConfig(
            hidden=P.dim_hidden if P.dim_hidden > 64 else 256,
            sigma_depth=max(P.sigma_depth, 8),
            color_hidden=P.color_hidden,
            color_depth=max(P.color_depth, 2),
            dir_encoding=P.dir_encoding,
        )

    boundary_margin = min(max(1.0, P.bm), float(clustering_params["boundary_margin"]))
    return ContainerConfig(
        num_submodules=P.num_submodules,
        nerf_variant=P.nerf_variant,
        boundary_margin=boundary_margin,
        cluster_2d=bool(clustering_params["cluster_2d"]),
        use_bg_nerf=not P.no_bg_nerf,
        bg_hidden=P.bg_hidden,
        bg_encoding=P.bg_encoding,
        expert=expert_cfg,
    )


def build_occ_config(P, pose_scale_factor: float) -> Optional[OccConfig]:
    """The occ_conf dict of the reference runner (nerf_runner.py:121-148)."""
    if not P.use_occ:
        return None
    return OccConfig(
        resolution=128,
        levels=int(getattr(P, "occ_levels", 1)),
        render_step_size=None,
        occ_thre=1e-2,
        alpha_thre=1e-2,
        alpha_thre_start=0.0,
        cosine_anneal=True,
        warmup_steps=int(getattr(P, "occ_warmup", 256)),
        update_interval=16,
        ema_decay=0.95,
        cone_angle=0.004,
        near_plane=(P.near if P.near is not None else 0.05 / pose_scale_factor),
        far_plane=(P.far if P.far is not None else 1e3 / pose_scale_factor),
    )


def _start_tunnel_keepalive(interval_s: float = 10.0) -> None:
    """Ping the device periodically from a daemon thread.

    On the remote-TPU (axon) platform, the first RPC after minutes of
    host-only work (ray prep, routing) can wedge forever — observed twice as
    a lowering-time constant fetch blocking in ``Array._value`` with zero CPU
    activity. Tiny periodic transfers keep the tunnel's connection alive
    through the host-heavy phases. No-op off the remote platform.
    """
    import threading

    try:
        if jax.default_backend() not in ("axon", "tpu"):
            return
    except Exception:
        return

    def ping():
        while True:
            try:
                np.asarray(jnp.zeros(()))  # tiny round trip
            except Exception:
                pass
            time.sleep(interval_s)

    t = threading.Thread(target=ping, daemon=True, name="tunnel-keepalive")
    t.start()


def build_context(P, op: str) -> Dict[str, Any]:
    ctx: Dict[str, Any] = {"P": P, "op": op}
    _start_tunnel_keepalive()

    if getattr(P, "checkpoint_path", None):
        P.checkpoint_path = resolve_checkpoint_dir(P.checkpoint_path, logs_root="logs")

    data_path = Path(P.data_path) / "out" / P.data_dirname
    mask_dir = data_path / "masks" / P.mask_dirname
    clustering_params = load_clustering_meta(mask_dir)
    coordinate_info = load_coordinates(data_path)
    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)

    # metric meters → normalized units (reference nerf_runner.py:91-95);
    # skipped when these values were restored from a checkpoint's P.json,
    # which stores them post-normalization
    # tracked per field: a mixed restore (fresh --near, checkpointed far)
    # must not divide the already-normalized member a second time
    psf = coordinate_info["pose_scale_factor"]
    if not getattr(P, "near_normalized", 0):
        P.near = P.near / psf if P.near is not None else None
        P.near_normalized = 1
    if not getattr(P, "far_normalized", 0):
        P.far = P.far / psf if P.far is not None else None
        P.far_normalized = 1
    P.near_far_normalized = 1

    cfg = build_model_configs(P, clustering_params)
    occ_cfg = build_occ_config(P, psf)

    key = jax.random.PRNGKey(P.seed)
    variables = cont.init_container(
        key,
        cfg,
        jnp.asarray(clustering_params["centroids"], jnp.float32),
        jnp.asarray(expert_aabbs),
        jnp.asarray(global_aabb),
    )

    ctx.update(
        cfg=cfg,
        occ_cfg=occ_cfg,
        variables=variables,
        clustering_params=clustering_params,
        coordinate_info=coordinate_info,
        global_aabb=global_aabb,
        expert_aabbs=expert_aabbs,
        data_path=data_path,
        step=0,
        best=float("-inf"),
        occ_states=None,
    )

    # checkpoint restore (model side); unreadable checkpoints (pre-atomic
    # truncation) fall back to the next-older tag instead of crash-looping
    # the supervisor
    if getattr(P, "checkpoint_path", None):
        loaded, tag_used = load_checkpoint_with_fallback(P.checkpoint_path, P.prefix)
        if tag_used != P.prefix:
            print(f"[ckpt] '{P.prefix}' unreadable — resumed from '{tag_used}'")
            P.prefix = tag_used  # keep optimizer restore consistent
        # device_put ONCE: msgpack restore yields numpy pytrees, and every
        # jitted call re-uploads numpy args — at ~0.5 GB of params through
        # the remote tunnel that made each render chunk cost minutes
        ctx["variables"] = jax.device_put(
            restore_variables_like(variables, loaded["variables"])
        )
        ctx["step"] = loaded["step"]
        ctx["best"] = loaded["best"]
        if loaded.get("occ_states") is not None and occ_cfg is not None:
            template = jax.vmap(lambda ab: occ_grid.init_occ_state(ab, occ_cfg))(
                jnp.asarray(expert_aabbs)
            )
            ctx["occ_states"] = jax.device_put(
                restore_variables_like(template, loaded["occ_states"])
            )

    logger = Logger(P.fname, rank=getattr(P, "rank", 0))
    ctx["logger"] = logger

    if op == "train":
        train_sets, val_sets = get_dataset(
            P,
            expert_aabbs=expert_aabbs,
            global_aabb=global_aabb,
            near_far_override=(P.near, P.far),
        )
        assert len(train_sets) == P.num_submodules, (
            f"expected {P.num_submodules} per-expert train sets, got {len(train_sets)}"
        )
        train_samplers = [
            TaskSampler(
                ds,
                expert_aabbs[i],
                P.cell_dim,
                P.support_rays,
                P.query_rays,
                seed=P.seed + i,
            )
            for i, ds in enumerate(train_sets)
        ]
        test_samplers = [
            TaskSampler(
                ds,
                expert_aabbs[i],
                P.cell_dim,
                P.support_rays,
                P.query_rays,
                seed=P.seed + 1000 + i,
            )
            for i, ds in enumerate(val_sets)
        ]
        ctx["train_sampler"] = MultiTaskSampler(train_samplers)
        ctx["test_sampler"] = (
            MultiTaskSampler(test_samplers) if test_samplers else None
        )
        if not getattr(P, "no_device_sampling", False):
            from acn_tpu.data.tasks import build_device_pools

            ctx["device_pools"] = build_device_pools(train_samplers, seed=P.seed)
        else:
            ctx["device_pools"] = None

        labels = cont.param_group_labels(ctx["variables"], cfg)
        ctx["optimizer"] = build_optimizer(P, labels, grad_clip=P.grad_clip)

        if P.use_occ and ctx["occ_states"] is None:
            # premark invisible cells from all camera frusta
            # (reference nerf_runner.py:188-198 → meta_container.py:396-444)
            train_md, val_md = get_image_metadata(data_path, P.downscale)
            all_md = [m for m in (train_md + val_md) if m is not None]
            ctx["occ_states"] = premark_occ_states(
                cfg, occ_cfg, expert_aabbs, all_md,
                near_plane=P.near if P.near is not None else 1e-3,
            )
            logger.log("[OCC] premarked invisible cells for all experts")

        ctx["mesh"] = make_mesh(P.num_submodules, P.mesh_experts, P.mesh_data)

    elif op in ("eval", "video"):
        if not getattr(P, "checkpoint_path", None):
            raise ValueError(f"--checkpoint_path is required when --op {op}")
        _, test_meta = get_image_metadata(data_path, P.downscale)
        if P.cap_images is not None:
            from acn_tpu.data.dataset import cap_metadata

            test_meta = cap_metadata(test_meta, P.cap_images)
        ctx["test_metadata"] = test_meta

    elif op == "view":
        if not getattr(P, "checkpoint_path", None):
            raise ValueError("--checkpoint_path is required when --op view")

    elif op in ("bake", "bench"):
        # model/occ context only — no dataset load ("bench" is the
        # context-only mode scripts/bench_render.py uses to restore a
        # trained field exactly as eval does, without metadata IO)
        if not getattr(P, "checkpoint_path", None):
            raise ValueError(f"--checkpoint_path is required when --op {op}")

    else:
        raise ValueError(f"Unsupported op {op!r}")

    return ctx


def premark_occ_states(cfg, occ_cfg, expert_aabbs, metadata_items, near_plane):
    """Init stacked occ states and frustum-premark them
    (reference meta_ngp.py:260-353: RUB→RDF conversion + mark_invisible_cells)."""
    mds = [m for m in metadata_items if m is not None]
    if not mds:
        return jax.vmap(lambda ab: occ_grid.init_occ_state(ab, occ_cfg))(
            jnp.asarray(expert_aabbs)
        )

    def make_K(md):
        fx, fy, cx, cy = [float(v) for v in md.intrinsics[:4]]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    K_mats = jnp.asarray(np.stack([make_K(m) for m in mds]))
    # RUB→RDF: flip y and z columns of the rotation (meta_ngp.py:284-316)
    C3 = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    c2w = np.stack([m.c2w for m in mds]).astype(np.float32)
    c2w_rdf = np.concatenate([c2w[:, :, :3] @ C3, c2w[:, :, 3:]], axis=2)
    c2w_rdf = jnp.asarray(c2w_rdf)
    W, H = int(mds[0].W), int(mds[0].H)

    # cameras are ARGUMENTS, not closure constants: closure-captured device
    # arrays embed as MLIR constants whose values are fetched during
    # lowering — a blocking device→host round trip that can wedge on the
    # remote-TPU tunnel
    @jax.jit
    def premark_one(ab, K_in, c2w_in):
        state = occ_grid.init_occ_state(ab, occ_cfg)
        return occ_grid.mark_invisible_cells(
            state, K_in, c2w_in, W, H, float(near_plane), occ_cfg
        )

    # sequential per expert: the frustum sweep over all grid cells is memory-
    # heavy; vmapping K experts multiplies the working set
    states = [
        premark_one(jnp.asarray(ab), K_mats, c2w_rdf)
        for ab in np.asarray(expert_aabbs)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


# -----------------------------
# Ops
# -----------------------------


def op_train(ctx):
    from acn_tpu.pipelines.offline_stage.trainer import meta_trainer

    P = ctx["P"]
    logger = ctx["logger"]
    logger.log(str(vars(P)))

    optimizer = ctx["optimizer"]
    opt_state = optimizer.init(ctx["variables"]["params"])
    if getattr(P, "checkpoint_path", None):
        opt_state = load_opt_state(P.checkpoint_path, P.prefix, opt_state)

    state = {"variables": ctx["variables"], "opt_state": opt_state, "step": ctx["step"]}
    meta_trainer(
        P,
        ctx["cfg"],
        state,
        optimizer,
        ctx["train_sampler"],
        ctx["test_sampler"],
        logger,
        occ_cfg=ctx["occ_cfg"],
        occ_states=ctx["occ_states"],
        mesh=ctx["mesh"],
        start_step=ctx["step"],
        best=ctx["best"],
        device_pools=ctx.get("device_pools"),
    )
    logger.close()


def op_eval(ctx):
    from acn_tpu.pipelines.online_stage.runtime_adapt import runtime_evaluate

    P = ctx["P"]
    if getattr(P, "baked_asset", None):
        # score the amortized serving path (--op bake) under the standard
        # eval protocol: full-image PSNR/SSIM vs the val views — the
        # baked-vs-live quality delta at real scale
        from acn_tpu.pipelines.baking import BakedRenderer, load_baked

        # budget 0 (the config default) = the UNBIASED per-ray strided
        # marcher — the right default for a quality protocol: on dense
        # baked grids the global budget pack drops samples tail-first
        # (round-6: 5.45 dB at budget 4 vs strided scoring). Set
        # --occ_budget_per_ray > 0 for FPS-style budget marching.
        ctx["baked_renderer"] = BakedRenderer(
            load_baked(P.baked_asset),
            budget_per_ray=int(getattr(P, "occ_budget_per_ray", 0) or 0),
            # --occ_render_s_max: same flag the live serving renderer uses.
            # NOTE round-6 measured XLA-TPU compile times for baked frame
            # programs: budget 4 / s_max 32 blocks compile in minutes;
            # budget 24 / s_max 128 blocks sat >43 min in
            # backend_compile_and_load (BASELINE.md round-6) — keep eval
            # marchers in the proven class on the remote-tunnel platform.
            s_max=int(getattr(P, "occ_render_s_max", 0) or 128),
            chunk_points=int(P.chunk_points),
            bg_color=P.bg_color_default,
            s_coarse=int(getattr(P, "occ_render_s_coarse", 0) or 0),
        )
    base_variables = ctx["variables"]  # reset point between TTO settings
    tto_list = [int(t) for t in str(P.tto).split(",")]
    results = []
    for tto in tto_list:
        ctx["variables"] = base_variables  # (reference nerf_runner.py:327, 343)
        res = runtime_evaluate(ctx, tto=tto)
        results.append({"tto": tto, **res})
        ctx["logger"].log(f"[eval tto={tto}] {res}")
    # summary table + LaTeX (the reference prints a pandas LaTeX table,
    # nerf_runner.py:364-366)
    hdr = f"{'tto':>6} {'psnr':>8} {'ssim':>8} {'lpips':>8} {'duration':>9}"
    ctx["logger"].log(hdr)
    for r in results:
        ctx["logger"].log(
            f"{r['tto']:>6} {r.get('psnr', float('nan')):>8.3f} "
            f"{r.get('ssim', float('nan')):>8.4f} {r.get('lpips', float('nan')):>8.4f} "
            f"{r.get('duration', float('nan')):>9.2f}"
        )
    try:
        import pandas as pd

        df = pd.DataFrame(results).set_index("tto")
        ctx["logger"].log("\n" + df.to_latex(float_format="%.4f"))
    except Exception:
        pass
    return results


def op_video(ctx):
    from acn_tpu.pipelines.video_gen import render_video

    n = int(getattr(ctx["P"], "video_frames", 0) or 120)
    return render_video(ctx, n_poses=n)


def op_view(ctx):
    from acn_tpu.viewer.viewer import launch_viewer

    return launch_viewer(ctx)


def op_bake(ctx):
    """Distill the restored field into a baked serving asset
    (pipelines/baking.py): logs/<fname>/baked_<R>.npz, renderable via
    ``--op video --baked_asset <path>`` or scripts/bench_render."""
    from pathlib import Path

    from acn_tpu.pipelines.baking import bake_container, save_baked

    P, logger = ctx["P"], ctx["logger"]
    R = int(P.bake_resolution)
    t0 = time.time()
    baked = bake_container(
        ctx["variables"], ctx["cfg"], aabb=np.asarray(ctx["global_aabb"]),
        resolution=R, bake_dirs=int(P.bake_dirs),
        sh_degree=int(getattr(P, "bake_sh", 0)),
        supersample=int(getattr(P, "bake_supersample", 1)),
    )
    occ_frac = float(np.asarray(baked["occ_state"]["binaries"]).mean())
    out = Path(logger.logdir) / f"baked_{R}.npz"
    save_baked(out, baked)
    logger.log(
        f"[bake] {R}^3 table ({baked['table'].nbytes / 2**20:.0f} MB, "
        f"{occ_frac:.1%} cells occupied) in {time.time() - t0:.1f}s → {out}"
    )
    return str(out)


def main(argv=None):
    # live stack dumps on SIGUSR1 — long TPU compiles are indistinguishable
    # from hangs without this
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1)
    except (AttributeError, ValueError):
        pass

    P = parse_args(argv)

    # bound the whole pre-loop phase (client creation, checkpoint upload,
    # pool device_put) against remote-tunnel wedges: the trainer's loop
    # watchdog can't cover what happens before it arms
    from acn_tpu.utils import startup

    startup.arm(
        float(getattr(P, "startup_timeout", 2400) or 0),
        what=f"op={P.op} startup (backend/restore/data)",
    )

    # multi-host (pod) runs: initialize the distributed runtime before any
    # backend touch so jax.devices() spans all hosts (SURVEY §5)
    from acn_tpu.parallel.mesh import maybe_init_distributed

    if maybe_init_distributed(P):
        P.rank = jax.process_index()

    ctx = build_context(P, P.op)
    if P.op != "train":
        # device setup survived; train keeps the guard armed until the
        # trainer's own loop watchdog takes over (trainer.py)
        startup.mark_ready()
    if P.op == "train":
        op_train(ctx)
    elif P.op == "eval":
        op_eval(ctx)
    elif P.op == "video":
        op_video(ctx)
    elif P.op == "view":
        op_view(ctx)
    elif P.op == "bake":
        op_bake(ctx)
    else:
        raise ValueError(P.op)


if __name__ == "__main__":
    main()
