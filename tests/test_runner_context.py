"""build_context op dispatch: the context-only ops ("bake", "bench") must
build + restore a model WITHOUT loading datasets — "bench" is the mode
scripts/bench_render.py uses to bench a trained field. Regression guard for
the round-5 orchestrator crash (the bake-op else-raise rejected 'bench').
"""

import jax
import jax.numpy as jnp
import pytest

from acn_tpu.models import container as cont
from acn_tpu.runner import build_context, build_model_configs
from acn_tpu.utils.checkpoint import save_checkpoint
from acn_tpu.utils.config import parse_args as parse_P
from acn_tpu.data.dataset import load_clustering_meta, load_scene_boxes

EXAMPLE = "data/drz"
TINY = [
    "--data_path", EXAMPLE, "--data_dirname", "example",
    "--mask_dirname", "g22_grid_bm110_ss11",
    "--log2_hashmap_size", "6", "--hash_levels", "2",
    "--dim_hidden", "8", "--color_hidden", "8", "--bg_hidden", "8",
]


def _tiny_run_dir(tmp_path):
    """Save a checkpoint shaped exactly as build_context would build it."""
    from pathlib import Path

    P = parse_P(["--op", "train", "--fname", "ctx_fixture", *TINY])
    data_path = Path(P.data_path) / "out" / P.data_dirname
    mask_dir = data_path / "masks" / P.mask_dirname
    clustering_params = load_clustering_meta(mask_dir)
    global_aabb, expert_aabbs = load_scene_boxes(mask_dir)
    cfg = build_model_configs(P, clustering_params)
    variables = cont.init_container(
        jax.random.PRNGKey(7), cfg,
        jnp.asarray(clustering_params["centroids"], jnp.float32),
        jnp.asarray(expert_aabbs), jnp.asarray(global_aabb),
    )
    run = tmp_path / "tiny_run"
    save_checkpoint(run, "best", variables, P=P, step=3, best=12.5)
    return run, variables


def test_build_context_bench_op_restores_without_dataset(tmp_path):
    run, saved = _tiny_run_dir(tmp_path)
    P = parse_P(["--op", "eval", "--checkpoint_path", str(run),
                 "--prefix", "best", "--fname", "ctx_bench", *TINY])
    ctx = build_context(P, "bench")
    assert ctx["step"] == 3
    # weights restored, not re-initialized
    got = jax.tree_util.tree_leaves(ctx["variables"]["params"])
    want = jax.tree_util.tree_leaves(saved["params"])
    assert all(jnp.allclose(g, w) for g, w in zip(got, want))
    # context-only: no dataset artefacts in the context
    assert "test_metadata" not in ctx and "train_sampler" not in ctx


def test_build_context_rejects_unknown_op(tmp_path):
    run, _ = _tiny_run_dir(tmp_path)
    P = parse_P(["--op", "eval", "--checkpoint_path", str(run),
                 "--prefix", "best", "--fname", "ctx_bad", *TINY])
    with pytest.raises(ValueError, match="Unsupported op"):
        build_context(P, "frobnicate")
