"""CLI / config system.

Mirrors the reference's ``common/args.py``: one argparse namespace ``P``
threaded everywhere, ~70 flags with identical names and defaults, JSON config
files keyed by argparse dests, and the merge priority

    defaults < checkpoint < JSON (if not on CLI) < CLI

with ``ARCH_KEYS`` always force-loaded from the checkpoint's saved config so a
checkpoint reconstructs its own architecture (reference common/args.py:212-270).
Unlike the reference (which pickles the namespace into a ``.P`` torch file),
checkpointed configs are plain JSON (``{prefix}.P.json``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="acn_tpu — TPU-native adaptive NeRF")
    parser.add_argument(
        "--op", type=str, default="train",
        choices=["train", "eval", "view", "video", "bake"],
    )
    # --- baked serving asset (op=bake / video --baked_asset)
    parser.add_argument(
        "--bake_resolution", type=int, default=512,
        help="voxel lattice resolution for --op bake (pipelines/baking.py): "
             "the trained field distills into a (R^3, 4) [rgb, sigma] table "
             "+ marching occupancy, served with no per-sample hash/MLP work")
    parser.add_argument("--bake_dirs", type=int, default=4,
                        help="directions averaged for the diffuse bake "
                             "(raised to >=8 when --bake_sh 1)")
    parser.add_argument(
        "--bake_sh", type=int, default=0, choices=[0, 1],
        help="baked view-dependence: 0 = diffuse [rgb, sigma] (4 ch), "
             "1 = SH-1 coefficients (13 ch — same gather count at serving "
             "time, ~3.25x table memory)")
    parser.add_argument(
        "--bake_supersample", type=int, default=1,
        help="anti-aliased bake: average the field over an s^3 sub-lattice "
             "per voxel (s^3x bake cost, no extra memory)")
    parser.add_argument(
        "--baked_asset", type=str, default=None,
        help="path to a baked .npz (from --op bake): op=video renders from "
             "it instead of the live field")

    parser.add_argument(
        "--use_stored_args", action="store_true",
        help="accepted for reference-README compatibility; a no-op — the "
             "checkpoint's stored config is always merged (defaults < "
             "checkpoint < JSON < CLI), exactly like the reference's "
             "actual behavior (its README documents this flag but its "
             "args.py never defines it)")
    # --- system
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--profile_at", type=int, default=0,
                        help="capture a jax.profiler trace starting at this "
                             "step (0 = off)")
    parser.add_argument("--profile_steps", type=int, default=3)
    parser.add_argument("--watchdog_timeout", type=float, default=900,
                        help="hard-exit(42) if no training-loop progress for "
                             "this many seconds (wedged remote transfers); "
                             "0 disables. Pair with scripts/supervise_train.sh "
                             "for auto-resume. Raise on cold compile caches")
    parser.add_argument("--startup_timeout", type=float, default=2400,
                        help="hard-exit(43) if startup (backend client, "
                             "checkpoint upload, data device_put) hasn't "
                             "reached the training loop in this many seconds "
                             "— catches tunnel wedges the loop watchdog "
                             "can't see; 0 disables")
    # multi-host (pod) coordination; unset ⇒ single-process
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--use_amp", action="store_true",
                        help="bf16 compute for model evaluation (TPU-native AMP)")

    # --- io/logging
    parser.add_argument("--eval_step", type=int, default=200)
    parser.add_argument("--save_step", type=int, default=1000)
    parser.add_argument("--save_optimizer", type=int, default=1,
                        help="step-tagged saves include the optax state + occ "
                             "grids so watchdog resumes are loss-free; set 0 "
                             "for params-only saves when HBM is tight")
    parser.add_argument("--print_step", type=int, default=1)
    parser.add_argument(
        "--log_method", type=str, default="step", choices=["step", "patch"],
        help="surface parity with the reference (common/args.py:23); "
             "consumed nowhere in the reference either"
    )

    # --- data
    parser.add_argument(
        "--dataset",
        type=str,
        default="drz",
        choices=["ffhq", "celeba", "imagenette", "voxceleb", "drz"],
    )
    parser.add_argument(
        "--data_type", type=str, default="ray", choices=["img", "video", "ray"]
    )
    parser.add_argument("--data_path", type=str, default="data/drz/")
    parser.add_argument("--data_dirname", type=str, default="balanced")
    parser.add_argument("--mask_dirname", type=str, default="g22_grid_bm110_ss11")
    parser.add_argument("--cap_images", type=int, default=None)
    parser.add_argument("--downscale", type=float, default=0.25)
    parser.add_argument("--near", type=float, default=None)
    parser.add_argument("--far", type=float, default=None)
    # internal: set once build_context divides near/far (meters) by the
    # pose_scale_factor. Rides checkpointed P.json so resuming from a
    # checkpoint (whose stored near/far are already normalized) does not
    # divide a second time.
    parser.add_argument("--near_far_normalized", type=int, default=0,
                        help=argparse.SUPPRESS)
    # per-field tracking: a mixed restore (e.g. fresh --near on the CLI with
    # the checkpoint's already-normalized far) must normalize ONLY the fresh
    # member of the pair. near_far_normalized is kept as the legacy
    # both-or-neither input for pre-split checkpoints.
    parser.add_argument("--near_normalized", type=int, default=0,
                        help=argparse.SUPPRESS)
    parser.add_argument("--far_normalized", type=int, default=0,
                        help=argparse.SUPPRESS)
    parser.add_argument("--bm", type=float, default=1.05)

    # --- episode gen
    parser.add_argument("--support_rays", type=int, default=4000)
    parser.add_argument("--query_rays", type=int, default=2000)
    parser.add_argument("--cell_dim", type=int, default=5)

    # --- dataloader
    parser.add_argument("--batch_size", type=int, default=3)
    parser.add_argument("--test_batch_size", type=int, default=1)

    # --- model
    parser.add_argument("--num_submodules", type=int, default=4)
    parser.add_argument(
        "--nerf_variant", type=str, default="instant", choices=["instant", "vanilla"]
    )
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--sigma_depth", type=int, default=2)
    parser.add_argument("--color_depth", type=int, default=2)
    parser.add_argument("--dim_hidden", type=int, default=64)
    parser.add_argument("--color_hidden", type=int, default=64)

    # --- hash encoding
    parser.add_argument("--max_res", type=int, default=4096)
    parser.add_argument("--log2_hashmap_size", type=int, default=20)
    parser.add_argument("--hash_levels", type=int, default=16,
                        help="multiresolution hash levels L")
    parser.add_argument("--hash_features", type=int, default=2,
                        help="features per level F. Encoding width = L*F; "
                             "TPU hash traffic is row-count-bound at "
                             "points*L rows, so L8/F4 halves gather/scatter "
                             "rows at equal encoding width vs L16/F2")
    parser.add_argument("--use_occ", action="store_true")
    parser.add_argument(
        "--xyz_encoding", type=str, default="hash",
        choices=["frequency", "hash"],
        help="ARCH_KEYS surface parity (reference common/args.py:70); the "
             "instant variant is hash-only in both implementations — use "
             "--nerf_variant vanilla for a frequency-encoded expert"
    )
    parser.add_argument(
        "--dir_encoding",
        type=str,
        default="spherical",
        choices=["frequency", "spherical"],
    )
    parser.add_argument(
        "--hash_backend", type=str, default="auto", choices=["auto", "jnp"],
        help="hash-encode path; the XLA gather emitter measures AT the HBM "
             "transaction roofline for this access pattern, so there is no "
             "Mosaic variant to select (docs/hashgrid_kernel_memo.md)"
    )
    parser.add_argument(
        "--hash_dense_levels", type=int, nargs="?", const=1, default=1,
        help="clamp coarse cell-layout levels to dense res^3 tables with "
             "collision-free linear indexing (tcnn semantics; collision-free "
             "coarse levels AND far smaller scatter targets — default on "
             "since r3). Changes table shapes -> pinned via ARCH_KEYS; old "
             "checkpoints restore with their own setting")
    parser.add_argument(
        "--hash_layout", type=str, default="cell", choices=["cell", "corner"],
        help="hash-grid memory layout: 'cell' (TPU-native, 8 corner features "
        "packed per gathered row — ~8x fewer gather/scatter rows) or 'corner' "
        "(classic Instant-NGP, bit-compatible with the reference)",
    )

    # --- background model
    parser.add_argument("--no_bg_nerf", action="store_true")
    parser.add_argument(
        "--bg_color_default",
        type=str,
        default="random",
        choices=["white", "black", "none", "last_sample", "random"],
    )
    parser.add_argument("--bg_hidden", type=int, default=32)
    parser.add_argument(
        "--bg_encoding",
        type=str,
        default="spherical",
        choices=["frequency", "spherical"],
    )

    # --- rendering
    parser.add_argument("--ray_samples", type=int, default=96)
    parser.add_argument("--chunk_points", type=int, default=262_144 * 17)
    parser.add_argument(
        "--color_space",
        type=str,
        default="linear",
        choices=["srgb", "linear", "identity"],
    )
    # occupancy marching (static-shape TPU layout; no reference analogue —
    # nerfacc sizes are dynamic)
    parser.add_argument("--occ_s_max", type=int, default=256,
                        help="uniform candidate bins per ray spanning [near, far] "
                             "for occupancy marching")
    parser.add_argument("--occ_s_kept", type=int, default=64,
                        help="retained samples per ray after even-stride "
                             "compaction (model evals/ray in the occ regime; "
                             "keep < ray_samples or occ can't beat stratified)")
    parser.add_argument("--eval_render", type=str, default="dispatch",
                        choices=["stratified", "dispatch"],
                        help="mid-train eval renderer. 'dispatch' mirrors the "
                             "train renderer (reference parity; on a sharp "
                             "field the occ path's 256-bin occupancy-"
                             "concentrated sampling resolves surfaces better "
                             "than 96 uniform samples — measured +2.9 dB); "
                             "'stratified' keeps one instrument across the "
                             "warmup switch")
    parser.add_argument("--occ_budget_per_ray", type=int, default=0,
                        help="global cross-ray sample budget: exactly "
                             "N*budget model evals per episode render (MoE-"
                             "capacity-style packing; 0 = per-ray s_kept "
                             "layout). Unmasks the full data-dependent "
                             "sparsity of a sharp occupancy grid")
    parser.add_argument("--occ_regime", default="auto",
                        choices=["auto", "strided", "budget"],
                        help="marching regime when --occ_budget_per_ray>0: "
                             "'auto' (default) trains on the unbiased per-"
                             "ray strided path while measuring the would-be "
                             "drop rate at the configured budget, switching "
                             "to the ~2x faster global-budget marcher once "
                             "it stays under --occ_auto_thresh (blind "
                             "budget marching on dense post-warmup grids "
                             "dropped 54-70%% of valid samples and sent "
                             "eval PSNR falling); 'budget'/'strided' force "
                             "a regime. The auto decision persists through "
                             "checkpoints (P.occ_regime='budget')")
    parser.add_argument("--occ_auto_thresh", type=float, default=0.02,
                        help="auto-regime safety threshold: max would-be "
                             "drop fraction for the budget marcher")
    parser.add_argument("--occ_auto_patience", type=int, default=3,
                        help="consecutive in-threshold readings (at "
                             "--print_step cadence) before auto switches")
    parser.add_argument("--occ_render_s_max", type=int, default=0,
                        help="march bins per ray for RENDERING (viewer/video/"
                             "serving). The march cost is N*s_max bins per "
                             "frame chunk and dominates at tight budgets; "
                             "coarser render bins trade sampling resolution "
                             "for FPS. 0 = occ_s_max (the eval-parity "
                             "instrument)")
    parser.add_argument("--occ_render_s_coarse", type=int, default=0,
                        help="range-finding pre-pass bins for the routed "
                             "(single-expert) render path: tighten each "
                             "ray's [near,far] to the expert's occupied "
                             "span so occ_render_s_max fine bins sample it "
                             "densely (0 = off)")
    parser.add_argument("--occ_warmup", type=int, default=256,
                        help="steps of stratified warmup before the occupancy "
                             "renderer takes over (reference meta_ngp.py:131)")
    parser.add_argument("--occ_levels", type=int, default=1,
                        help="occupancy grid mip levels; 1 suffices when rays "
                             "are clamped to expert AABBs")

    # --- FIM
    parser.add_argument("--fim", action="store_true")
    parser.add_argument("--fim_per_sample", action="store_true")
    parser.add_argument("--fim_lambda", type=float, default=0.1)
    parser.add_argument("--fim_beta", type=float, default=0.95)
    parser.add_argument("--fim_epsilon", type=float, default=1e-6)

    # --- optimizer
    parser.add_argument(
        "--optimizer", type=str, default="adam", choices=["adamw", "sgd", "adam"]
    )
    parser.add_argument("--encoding_lr", type=float, default=1e-2)
    parser.add_argument("--sigma_lr", type=float, default=2e-3)
    parser.add_argument("--color_lr", type=float, default=2e-3)
    parser.add_argument("--bg_lr", type=float, default=1e-3)
    parser.add_argument("--lr", type=float, default=1e-4)

    # --- scheduler
    parser.add_argument("--no_scheduler", action="store_true")
    parser.add_argument("--decay_factor", type=float, default=10)

    # --- training
    parser.add_argument("--inner_iter", type=int, default=8)
    parser.add_argument("--inner_lr", type=float, default=15e-3)
    parser.add_argument("--outer_steps", type=int, default=20_000)
    parser.add_argument(
        "--algo", type=str, default="fomaml", choices=["maml", "fomaml", "reptile"]
    )
    parser.add_argument("--max_test_tasks", type=int, default=4)
    parser.add_argument("--grad_clip", type=float, default=1.0)
    parser.add_argument("--guard_nonfinite", type=int, default=0,
                        help="skip (rather than apply) any outer update whose "
                             "grads contain NaN/Inf — the reference's meta-"
                             "update guard (meta_core.py:124-126). Changes "
                             "the optimizer-state pytree: pick per run, not "
                             "mid-resume")

    # --- eval
    parser.add_argument("--tto", type=str, default="16")

    # --- video & viewing
    parser.add_argument(
        "--camera_path",
        type=str,
        default="full_coverage",
        choices=["spiral_in", "turntable", "east_west", "north_south", "full_coverage"],
    )
    parser.add_argument(
        "--video_frames", type=int, default=120,
        help="poses along --camera_path for --op video (reference "
             "video_gen.py renders a fixed-length path; this exposes the "
             "length — e.g. 36 for a quick turntable preview)")
    parser.add_argument("--viewer_timeout", type=int, default=900)
    parser.add_argument("--viewer_public_host", type=str, default="127.0.0.1")

    parser.add_argument(
        "--no_device_sampling", action="store_true",
        help="sample episodes on the host (reference-style loaders) instead "
        "of fusing episodic sampling into the jitted train step",
    )

    # --- parallelism (TPU mesh; no reference analogue — it is single-GPU)
    parser.add_argument("--mesh_experts", type=int, default=None,
                        help="devices along the expert axis (None = auto)")
    parser.add_argument("--mesh_data", type=int, default=1,
                        help="devices along the data axis")

    # --- extras
    parser.add_argument("--configPath", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=None)
    parser.add_argument("--log_date", action="store_true")
    parser.add_argument("--fname", default=None)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--prefix", type=str, default="best")  # best/last/step{i}
    parser.add_argument("--no_strict", action="store_true")

    return parser


# Architecture-defining keys, always pinned from a checkpoint's saved config
# (reference common/args.py:170-187).
ARCH_KEYS = {
    "num_submodules",
    "nerf_variant",
    "num_layers",
    "sigma_depth",
    "color_depth",
    "dim_hidden",
    "color_hidden",
    "max_res",
    "log2_hashmap_size",
    "hash_levels",
    "hash_features",
    "hash_layout",
    "hash_dense_levels",
    "xyz_encoding",
    "dir_encoding",
    "no_bg_nerf",
    "bg_hidden",
    "bg_encoding",
}


def _dests_on_cli(parser: argparse.ArgumentParser, argv) -> set:
    """Dest names the user explicitly passed on the command line — these pin
    their values against both the JSON config and the checkpoint layer."""
    dest_of = {
        opt: act.dest for act in parser._actions for opt in act.option_strings
    }
    return {
        dest_of[tok.partition("=")[0]]
        for tok in argv
        if tok.partition("=")[0] in dest_of
    }


def load_checkpoint_cfg(cfg_path: str) -> dict:
    """Load a checkpointed config. JSON-native; falls back to torch pickle for
    reference-produced ``.P`` files."""
    if cfg_path.endswith(".json") or os.path.exists(cfg_path + ".json"):
        path = cfg_path if cfg_path.endswith(".json") else cfg_path + ".json"
        with open(path) as f:
            return json.load(f)
    import torch  # compat path for reference checkpoints

    cfg_obj = torch.load(cfg_path, map_location="cpu", weights_only=False)
    return vars(cfg_obj) if hasattr(cfg_obj, "__dict__") else dict(cfg_obj)


def resolve_ckpt_cfg_path(checkpoint_path: str, prefix: str) -> Optional[str]:
    """Locate ``{prefix}.P.json`` (or the reference's ``.P``) for a checkpoint
    given as a directory OR a bare run name — the same resolution the weight
    loader applies (utils/checkpoint.py resolve_checkpoint_dir), so the
    config layer can never silently diverge from the weights it describes."""
    candidates = []
    try:
        from acn_tpu.utils.checkpoint import resolve_checkpoint_dir

        candidates.append(resolve_checkpoint_dir(checkpoint_path))
    except (FileNotFoundError, OSError):
        pass
    candidates.append(checkpoint_path)  # direct dir (cfg-only drops)
    for d in candidates:
        for suffix in (f"{prefix}.P.json", f"{prefix}.P"):
            p = os.path.join(d, suffix)
            if os.path.exists(p):
                return p
    return None


def parse_args(argv=None) -> argparse.Namespace:
    """Resolve the config namespace from its four layers.

    Priority (low → high): parser defaults, checkpointed config, JSON config
    file, explicit CLI flags — matching the reference's semantics
    (common/args.py:220-277). ``ARCH_KEYS`` are the exception: they describe
    the checkpoint's weights, so when a checkpoint is given they win over
    everything, CLI included.
    """
    parser = build_parser()
    argv = list(sys.argv[1:] if argv is None else argv)
    args = parser.parse_args(argv)
    args.checkpoint_path = args.checkpoint_path or None  # "" means unset

    pinned = _dests_on_cli(parser, argv)
    known = set(vars(args))

    ckpt_cfg: dict = {}
    if args.checkpoint_path:
        cfg_path = resolve_ckpt_cfg_path(args.checkpoint_path, args.prefix)
        if cfg_path:
            ckpt_cfg = load_checkpoint_cfg(cfg_path)

    json_cfg: dict = {}
    if args.configPath is not None:
        with open(args.configPath) as f:
            json_cfg = json.load(f)

    # apply layers low→high; CLI-pinned dests and unknown keys pass through
    # (the reference also silently drops unknown JSON keys, common/args.py:261-266)
    for layer in (ckpt_cfg, json_cfg):
        for k, v in layer.items():
            if k in known and k not in pinned:
                setattr(args, k, v)

    # the checkpoint's architecture is non-negotiable
    for k in ARCH_KEYS & set(ckpt_cfg):
        if k in known:
            setattr(args, k, ckpt_cfg[k])

    # near/far freshly given on the CLI or in the JSON config are in meters,
    # even when the checkpoint layer marked its own (stored) values as
    # normalized. Tracked PER FIELD: with e.g. a fresh --near and the
    # checkpoint's normalized far, only near may be normalized again.
    if ckpt_cfg.get("near_far_normalized") and "near_normalized" not in ckpt_cfg:
        args.near_normalized = args.far_normalized = 1  # pre-split checkpoint
    for field in ("near", "far"):
        if field in (pinned | set(json_cfg)):
            setattr(args, f"{field}_normalized", 0)
    args.near_far_normalized = int(args.near_normalized and args.far_normalized)

    # --hash_dense_levels predates some checkpoints: a restore whose P.json
    # lacks the key must keep the old behavior (0), not silently adopt the
    # new default and change table row counts
    if ckpt_cfg and "hash_dense_levels" not in ckpt_cfg \
            and "hash_dense_levels" not in (pinned | set(json_cfg)):
        args.hash_dense_levels = 0

    if args.fname is None:
        args.fname = default_experiment_fname(args)

    return args


def default_experiment_fname(P) -> str:
    """Hierarchical hyperparameter-encoding experiment path (reference
    pipelines/offline_stage/__init__.py:6-34): runs land under a directory
    tree keyed by data / modularization / algo / model / bg / training /
    optimizer, so sweeps self-organize. Train-op only; other ops get a
    timestamped name."""
    if P.op != "train":
        from datetime import datetime

        return f"{P.op}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    data = f"{getattr(P, 'data_type', 'ray')}/{P.dataset}/"
    modularization = f"cells-{P.num_submodules:02}/" + (
        "fim/" if getattr(P, "fim", False) else "mod/"
    )
    algo_str = f"algo-{P.algo}/"
    model = (
        f"{P.nerf_variant}_dir-{P.dir_encoding}_depth-{P.num_layers}"
        f"_hid-{P.dim_hidden}_ch-{P.color_hidden}/"
    )
    bg = "no_bg/" if P.no_bg_nerf else f"bg_{P.bg_hidden}/"
    training = f"initer-{P.inner_iter:02}_samples-{P.ray_samples}/"
    optimizer = f"lr-{int(P.inner_lr * 1e3):03d}-{int(P.lr * 1e6):04d}"
    return (
        data + modularization + algo_str + model + bg + training + optimizer
        + f"_seed-{P.seed}"
    )


def namespace_to_jsonable(args: argparse.Namespace) -> dict:
    """Serialize the namespace for checkpointing ({prefix}.P.json)."""
    out = {}
    for k, v in vars(args).items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            out[k] = str(v)
    return out
