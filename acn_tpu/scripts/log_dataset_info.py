"""Dataset audit: pose / intrinsics / extent / FOV statistics in DRB.

Counterpart of the reference's ``scripts/log_dataset_info.py``: writes an
``info.txt`` summarizing camera translation ranges, rotation orthonormality,
intrinsics and FOV statistics, and split sizes — the convention-audit tool
(flipped axes never crash, they just ruin training; this catches them).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Log dataset info")
    p.add_argument("--data_path", type=Path, required=True,
                   help="prepared dataset root (contains coordinates.pt)")
    p.add_argument("--out", type=Path, default=None,
                   help="output file (default <data_path>/info.txt)")
    return p


def dataset_info(data_path: Path) -> str:
    import torch

    lines = []
    coord = torch.load(data_path / "coordinates.pt", map_location="cpu",
                       weights_only=False)
    psf = float(coord["pose_scale_factor"])
    lines.append(f"pose_scale_factor: {psf:.4f} m")
    lines.append(f"origin_drb (m): {np.asarray(coord['origin_drb']).tolist()}")
    if coord.get("altitude_range_enu") is not None:
        lines.append(
            f"altitude_range_enu (m): {np.asarray(coord['altitude_range_enu']).tolist()}"
        )
    if coord.get("enu_ref_coords") is not None:
        lines.append(f"enu_ref_coords: {coord['enu_ref_coords']}")

    for split in ("train", "val"):
        meta_dir = data_path / split / "metadata"
        if not meta_dir.exists():
            continue
        files = sorted(meta_dir.glob("*.pt"))
        if not files:
            continue
        c2ws, intr, sizes = [], [], []
        for f in files:
            md = torch.load(f, map_location="cpu", weights_only=False)
            c2ws.append(np.asarray(md["c2w"], np.float64))
            intr.append(np.asarray(md["intrinsics"], np.float64))
            sizes.append((int(md["H"]), int(md["W"])))
        c2ws = np.stack(c2ws)
        intr = np.stack(intr)
        t = c2ws[:, :, 3]
        R = c2ws[:, :, :3]

        lines.append(f"\n==== split {split}: {len(files)} images ====")
        for a, name in enumerate(("Down", "Right", "Back")):
            lines.append(
                f"t.{name:<5} normalized: {t[:, a].min():+.4f} .. {t[:, a].max():+.4f}"
                f"  (m: {t[:, a].min() * psf:+.1f} .. {t[:, a].max() * psf:+.1f})"
            )
        # rotation orthonormality audit
        err = np.max(np.abs(np.einsum("nij,nkj->nik", R, R) - np.eye(3)))
        det = np.linalg.det(R)
        lines.append(f"R orthonormality max err: {err:.2e}; det range "
                     f"{det.min():.6f}..{det.max():.6f}")
        # camera forward = -z column (RUB): check cameras generally look down
        fwd_drb = -R[:, :, 2]
        lines.append(
            f"forward·Down mean: {fwd_drb[:, 0].mean():+.3f} "
            f"(aerial datasets should be positive)"
        )
        fx, fy = intr[:, 0], intr[:, 1]
        H = np.array([s[0] for s in sizes], np.float64)
        W = np.array([s[1] for s in sizes], np.float64)
        fov_x = 2 * np.degrees(np.arctan(W / (2 * fx)))
        fov_y = 2 * np.degrees(np.arctan(H / (2 * fy)))
        lines.append(f"fov_x: {fov_x.min():.2f}..{fov_x.max():.2f} deg; "
                     f"fov_y: {fov_y.min():.2f}..{fov_y.max():.2f} deg")
        lines.append(f"sizes: {sorted(set(sizes))}")
    return "\n".join(lines)


def main(h=None):
    if h is None:
        h = build_parser().parse_args()
    text = dataset_info(Path(h.data_path))
    out = h.out or (Path(h.data_path) / "info.txt")
    Path(out).write_text(text)
    print(text)
    print(f"\nwritten to {out}")


if __name__ == "__main__":
    main()
