"""Format-compat tests against the bundled reference-prepared example dataset.

These validate that our loaders read the *reference's* on-disk artifacts
(coordinates.pt, scene_boxes.pt, params.pt, metadata .pt, zipped masks) and
that our create_clusters writes artifacts our own loaders accept.
"""

from pathlib import Path

import numpy as np
import pytest

EXAMPLE = Path("data/drz/out/example")

pytestmark = pytest.mark.skipif(
    not EXAMPLE.exists(), reason="example dataset not present"
)


def test_load_coordinates():
    from acn_tpu.data.dataset import load_coordinates

    c = load_coordinates(EXAMPLE)
    assert c["origin_drb"].shape == (3,)
    assert 200 < c["pose_scale_factor"] < 260  # drz ≈ 227.4 m
    assert c["altitude_range_enu"] is not None


def test_load_clustering_meta_and_boxes():
    from acn_tpu.data.dataset import (
        discover_cluster_cells,
        load_clustering_meta,
        load_scene_boxes,
    )

    mask_dir = EXAMPLE / "masks" / "g22_grid_bm110_ss11"
    assert discover_cluster_cells(mask_dir) == 4
    meta = load_clustering_meta(mask_dir)
    assert meta["centroids"].shape == (4, 3)
    assert meta["cluster_2d"] is True
    assert abs(meta["boundary_margin"] - 1.1) < 1e-6

    gaabb, eaabbs = load_scene_boxes(mask_dir)
    assert gaabb.shape == (2, 3)
    assert eaabbs.shape == (4, 2, 3)
    assert np.all(eaabbs[:, 0] >= gaabb[0] - 1e-5)
    assert np.all(eaabbs[:, 1] <= gaabb[1] + 1e-5)


def test_image_metadata_and_mask_loading():
    from acn_tpu.data.dataset import get_image_metadata

    train_md, val_md = get_image_metadata(
        EXAMPLE, 0.25, mask_dir=EXAMPLE / "masks" / "g22_grid_bm110_ss11" / "0"
    )
    assert len(train_md) == 187
    assert len(val_md) == 62
    md = train_md[0]
    assert md.c2w.shape == (3, 4)
    # rotation orthonormal (RUB→DRB)
    R = md.c2w[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert md.W == 512 and md.H == 384  # 2048×1536 at 0.25
    m = md.load_mask()
    assert m is not None and m.shape == (md.H, md.W)
    img = md.load_image()
    assert img.shape == (md.H, md.W, 3) and img.dtype == np.uint8


def test_flat_layout_continual_batch():
    from acn_tpu.data.dataset import get_image_metadata

    batch = EXAMPLE / "continual" / "batch_0001"
    train_md, val_md = get_image_metadata(batch, 0.25)
    assert train_md == []
    assert len(val_md) > 0
    assert all(m.is_val for m in val_md)


def test_our_create_clusters_roundtrips(tmp_path):
    """Run our create_clusters on a 2-image slice of the example dataset and
    read the outputs back with our loaders."""
    import shutil
    import types

    import torch

    ds = tmp_path / "mini"
    for split in ("train", "val"):
        (ds / split / "metadata").mkdir(parents=True)
        (ds / split / "rgbs").mkdir(parents=True)
    # borrow two real metadata files (tiny H/W to keep routing fast)
    for i, src in enumerate(sorted((EXAMPLE / "train" / "metadata").glob("*.pt"))[:2]):
        md = torch.load(src, map_location="cpu", weights_only=False)
        md["H"], md["W"] = 48, 64
        md["intrinsics"] = md["intrinsics"] * (64 / 2048)
        torch.save(md, ds / "train" / "metadata" / f"{i:06d}.pt")
    shutil.copy(EXAMPLE / "coordinates.pt", ds / "coordinates.pt")

    from acn_tpu.scripts.create_clusters import build_parser, main

    h = build_parser().parse_args(
        [
            "--data_path", str(ds), "--output", "test_g22",
            "--centroid_mode", "grid", "--grid_dim", "2", "2",
            "--cluster_2d", "--boundary_margin", "1.1",
            "--ray_samples", "32", "--center_pixels",
            "--scene_scale", "1.1", "--ray_chunk_size", "4096",
        ]
    )
    main(h)

    from acn_tpu.data.dataset import (
        discover_cluster_cells,
        load_clustering_meta,
        load_scene_boxes,
    )

    out = ds / "masks" / "test_g22"
    assert discover_cluster_cells(out) == 4
    meta = load_clustering_meta(out)
    assert meta["centroids"].shape == (4, 3)
    gaabb, eaabbs = load_scene_boxes(out)
    assert eaabbs.shape == (4, 2, 3)
    # masks load through ImageMetadata
    from acn_tpu.data.image_metadata import ImageMetadata

    md0 = torch.load(ds / "train" / "metadata" / "000000.pt", map_location="cpu",
                     weights_only=False)
    im = ImageMetadata(
        image_path=ds / "train" / "rgbs" / "000000.jpg",
        c2w=np.asarray(md0["c2w"]), W=64, H=48,
        intrinsics=np.asarray(md0["intrinsics"]), image_index=0,
        mask_dir=out / "0",
    )
    m = im.load_mask()
    assert m is not None and m.shape == (48, 64)


def test_create_clusters_host_sharded_matches_single_process(tmp_path):
    """A rank-strided 2-process run (reference create_clusters.py:224-238 uses
    torchrun+NCCL; ours is env-var ranks + file-reduced partials) produces
    byte-identical masks and identical scene boxes to a single-process run."""
    import shutil

    import torch

    ds = tmp_path / "mini"
    for split in ("train", "val"):
        (ds / split / "metadata").mkdir(parents=True)
        (ds / split / "rgbs").mkdir(parents=True)
    srcs = sorted((EXAMPLE / "train" / "metadata").glob("*.pt"))[:4]
    for i, src in enumerate(srcs):
        md = torch.load(src, map_location="cpu", weights_only=False)
        md["H"], md["W"] = 48, 64
        md["intrinsics"] = md["intrinsics"] * (64 / 2048)
        torch.save(md, ds / "train" / "metadata" / f"{i:06d}.pt")
    shutil.copy(EXAMPLE / "coordinates.pt", ds / "coordinates.pt")

    from acn_tpu.scripts.create_clusters import build_parser, main

    base = [
        "--data_path", str(ds),
        "--centroid_mode", "grid", "--grid_dim", "2", "2",
        "--cluster_2d", "--boundary_margin", "1.1",
        "--ray_samples", "32", "--center_pixels",
        "--scene_scale", "1.1", "--ray_chunk_size", "4096",
    ]
    main(build_parser().parse_args(base + ["--output", "sp"]))
    # workers first, rank 0 last: its merge finds all partials immediately
    main(build_parser().parse_args(
        base + ["--output", "mp", "--rank", "1", "--world_size", "2"]))
    main(build_parser().parse_args(
        base + ["--output", "mp", "--rank", "0", "--world_size", "2",
                "--merge_timeout", "60"]))

    sp, mp = ds / "masks" / "sp", ds / "masks" / "mp"
    mask_files = sorted(p.relative_to(sp) for p in sp.rglob("*.pt")
                        if p.parent.name.isdigit())
    assert len(mask_files) == 4 * 4  # 4 images × 4 cells
    for rel in mask_files:
        assert (sp / rel).read_bytes() == (mp / rel).read_bytes(), rel

    bs = torch.load(sp / "scene_boxes.pt", map_location="cpu", weights_only=False)
    bm = torch.load(mp / "scene_boxes.pt", map_location="cpu", weights_only=False)
    for k in ("mins", "maxs", "counts", "centroids", "aabb_global"):
        torch.testing.assert_close(bs[k], bm[k], rtol=0, atol=0)
