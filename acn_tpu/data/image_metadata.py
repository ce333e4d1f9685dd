"""Per-image metadata records and lazy pixel/mask IO.

Counterpart of the reference's ``data/image_metadata.py`` (itself extending
Mega-NeRF's): a lazy record {path, c2w (3,4), W, H, intrinsics [fx fy cx cy],
index, is_val, mask_path}. IO is numpy-native; the on-disk formats stay
compatible with the reference's prepared datasets (`.pt` metadata files and
plain-or-zipped boolean masks), read via torch (CPU) and converted.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional
from zipfile import ZipFile

import numpy as np
from PIL import Image


def _torch_load(path_or_file):
    import torch

    return torch.load(path_or_file, map_location="cpu", weights_only=False)


@dataclass
class ImageMetadata:
    image_path: Path
    c2w: np.ndarray  # (3, 4) RUB→DRB rotation, normalized DRB translation
    W: int
    H: int
    intrinsics: np.ndarray  # (4,) [fx, fy, cx, cy] (already downscaled)
    image_index: int
    is_val: bool = False
    mask_dir: Optional[Path] = None

    @property
    def mask_path(self) -> Optional[Path]:
        if self.mask_dir is None:
            return None
        return Path(self.mask_dir) / f"{Path(self.image_path).stem}.pt"

    def load_image(self) -> np.ndarray:
        """RGB uint8 (H, W, 3), LANCZOS-resized to the record's target size
        (reference image_metadata.py:75-80)."""
        img = Image.open(self.image_path).convert("RGB")
        if img.size != (self.W, self.H):
            img = img.resize((self.W, self.H), Image.LANCZOS)
        return np.asarray(img, dtype=np.uint8)

    def load_mask(self) -> Optional[np.ndarray]:
        """Boolean (H, W) cluster mask from plain or zipped .pt; nearest-resized
        if stored at another resolution (reference image_metadata.py:82-123)."""
        mp = self.mask_path
        if mp is None or not mp.exists():
            return None
        try:
            m = _torch_load(mp)
        except Exception:
            with ZipFile(mp, "r") as zf:
                inner = zf.namelist()[0]
                with zf.open(inner) as f:
                    m = _torch_load(f)
        m = np.asarray(m)
        if m.ndim == 1:
            if m.size == self.H * self.W:
                m = m.reshape(self.H, self.W)
            else:
                return None
        if m.ndim != 2:
            return None
        if m.shape != (self.H, self.W):
            # nearest-neighbor resize keeps the mask discrete
            ys = (np.arange(self.H) * m.shape[0] / self.H).astype(np.int64)
            xs = (np.arange(self.W) * m.shape[1] / self.W).astype(np.int64)
            m = m[ys][:, xs]
        return m.astype(bool)


def load_metadata_file(
    metadata_path: Path,
    image_index: int,
    scale_factor: float,
    is_val: bool = False,
    mask_dir: Optional[Path] = None,
) -> Optional[ImageMetadata]:
    """One metadata .pt → ImageMetadata, intrinsics and size downscaled
    (reference dataset.py:257-291)."""
    metadata_path = Path(metadata_path)
    image_path = None
    for ext in (".jpg", ".JPG", ".png", ".PNG"):
        cand = metadata_path.parent.parent / "rgbs" / f"{metadata_path.stem}{ext}"
        if cand.exists():
            image_path = cand
            break
    if image_path is None:
        return None

    md = _torch_load(metadata_path)
    return ImageMetadata(
        image_path=image_path,
        c2w=np.asarray(md["c2w"], np.float32),
        W=int(round(int(md["W"]) * scale_factor)),
        H=int(round(int(md["H"]) * scale_factor)),
        intrinsics=np.asarray(md["intrinsics"], np.float32) * scale_factor,
        image_index=image_index,
        is_val=is_val,
        mask_dir=mask_dir,
    )
