"""Camera-path generators + fog suppression (pipelines/video_gen.py)."""

import numpy as np

from acn_tpu.pipelines import video_gen as vg


CENTER = np.array([0.0, 0.1, -0.2], np.float32)
EXTENT = np.array([0.4, 2.0, 2.0], np.float32)


def _check_poses(poses, n):
    poses = np.asarray(poses)
    assert poses.shape == (n, 4, 4)
    R = poses[:, :3, :3]
    # valid rotations: orthonormal, det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    assert np.all(np.linalg.det(R) > 0.99)
    return poses


def test_turntable_orbits_center():
    poses = _check_poses(vg.poses_turntable(CENTER, radius=1.5, n_poses=24), 24)
    t = poses[:, :3, 3]
    # constant distance from the orbit center
    r = np.linalg.norm(t - CENTER[None], axis=1)
    np.testing.assert_allclose(r, r[0], rtol=1e-4)
    # cameras above the scene (D = down ⇒ negative d is up)
    assert np.all(t[:, 0] < CENTER[0])
    # cameras look toward the center: forward (-z col, RUB) ≈ dir to center
    fwd = -poses[:, :3, 2]
    to_c = CENTER[None] - t
    to_c /= np.linalg.norm(to_c, axis=1, keepdims=True)
    assert float((fwd * to_c).sum(1).min()) > 0.95


def test_sweeps_translate_along_one_axis():
    for fn, axis in ((vg.poses_east_west, 1), (vg.poses_north_south, 2)):
        poses = _check_poses(fn(CENTER, EXTENT, 12), 12)
        t = poses[:, :3, 3]
        deltas = np.diff(t, axis=0)
        # dominant movement on the sweep axis, monotone
        assert np.abs(deltas[:, axis]).sum() > 0.5 * np.abs(deltas).sum()
        assert np.all(deltas[:, axis] > 0) or np.all(deltas[:, axis] < 0)


def test_spiral_and_coverage_stay_inside():
    poses = _check_poses(vg.poses_spiral_in(CENTER, EXTENT, 20), 20)
    t = poses[:, :3, 3]
    half = 0.5 * EXTENT
    assert np.all(np.abs(t - CENTER[None]) <= half[None] + 1e-5)

    poses = _check_poses(vg.poses_full_coverage(CENTER, EXTENT, 25), 25)


def test_suppress_fog_masks_low_confidence():
    rgb = np.full((8, 3), 0.5, np.float32)
    acc = np.array([0.9] * 4 + [0.03] * 4, np.float32)
    wmax = np.array([0.8] * 4 + [0.01] * 4, np.float32)
    went = np.array([1.0] * 4 + [4.5] * 4, np.float32)
    stats = vg.suppress_fog(rgb, acc, wmax, went, bg_val=1.0)
    # confident rays untouched; foggy rays pushed to background
    np.testing.assert_allclose(rgb[:4], 0.5, atol=1e-6)
    np.testing.assert_allclose(rgb[4:], 1.0, atol=1e-6)
    assert stats["pct_low"] == 0.5


def test_write_video_encoder_fallback(tmp_path):
    """Zero-install hosts have no ffmpeg backend: _write_video must still
    persist the rendered frames (GIF via Pillow) instead of raising after
    a long render (round-6: 36 frames died at iio.imwrite)."""
    from pathlib import Path

    import numpy as np

    from acn_tpu.pipelines.video_gen import _write_video

    class _L:
        def log(self, m):
            pass

    frames = [np.full((8, 8, 3), i * 40, np.uint8) for i in range(4)]
    out = _write_video(str(tmp_path / "clip.mp4"), frames, fps=10,
                       logger=_L())
    assert Path(out).exists() and Path(out).stat().st_size > 0
