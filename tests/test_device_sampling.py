"""Device-resident episodic sampling tests (incl. episode constraints)."""

import numpy as np
import jax
import jax.numpy as jnp

from acn_tpu.data.tasks import EpisodeConstraints, TaskSampler, build_device_pools
from acn_tpu.pipelines.offline_stage.train_step import make_device_batch_fn


class FakeDS:
    def __init__(self, n=4000, seed=0, y_range=(-1, 1), n_images=12):
        rng = np.random.default_rng(seed)
        o = np.concatenate(
            [np.full((n, 1), -2.0), rng.uniform(*y_range, (n, 1)),
             rng.uniform(-1, 1, (n, 1))], 1
        ).astype(np.float32)
        d = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
        nf = np.concatenate([np.zeros((n, 1)), np.full((n, 1), 10.0)], 1).astype(
            np.float32
        )
        self.rays = np.concatenate([o, d, nf], 1)
        self.rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        self.img_indices = rng.integers(0, n_images, n).astype(np.int32)


def make_samplers(K=2):
    region = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    return [
        TaskSampler(FakeDS(seed=k), region, cell_dim=3, support_rays=32,
                    query_rays=16, seed=k)
        for k in range(K)
    ]


def test_build_device_pools_shapes():
    samplers = make_samplers()
    pools = build_device_pools(samplers, max_pool=512)
    K = 2
    assert pools["rays"].shape[0] == K and pools["rays"].shape[2] == 8
    assert pools["pool_idx"].shape[:2] == (K, 9)
    assert pools["pool_idx"].shape[2] <= 512
    assert pools["eligible"].any()
    # every eligible cell has images with rays
    assert np.all(pools["img_count"][pools["eligible"]] > 0)
    elig = pools["eligible"]
    assert np.all(pools["img_len"][elig].sum(axis=-1) > 0)
    # image segments tile the pool without overlap
    for k in range(K):
        for c in range(9):
            n = int(pools["img_count"][k, c])
            starts = pools["img_start"][k, c, :n]
            lens = pools["img_len"][k, c, :n]
            ends = starts + lens
            assert (starts[1:] == ends[:-1]).all()
    # padded rays are inert
    assert (pools["rays"][..., 7] >= -1.0).all()


def test_device_batch_fn_samples_valid_episodes():
    samplers = make_samplers()
    pools_np = build_device_pools(samplers, max_pool=512)
    pools = {k: jnp.asarray(v) for k, v in pools_np.items()}
    T, S, Q = 3, 32, 16
    fn = jax.jit(make_device_batch_fn(T, S, Q))
    batch = fn(pools, jax.random.PRNGKey(0))

    assert batch["support_rays"].shape == (2, T, S, 8)
    assert batch["query_rays"].shape == (2, T, Q, 8)
    sr = np.asarray(batch["support_rays"])
    # all sampled rays are real (far=10), never padding (far=-1)
    assert (sr[..., 7] > 0).all()

    # support and query of one episode share a cell: cells are y/z boxes and
    # each ray's (y, z) origin lies in its cell → both sets within one cell
    cells = samplers[0].cells
    for t in range(T):
        s_o = sr[0, t, :, 1:3]
        q_o = np.asarray(batch["query_rays"])[0, t, :, 1:3]
        all_o = np.concatenate([s_o, q_o])
        # find a single cell containing all origins' y,z (rays go along +x)
        hit = False
        for c in cells:
            if (all_o >= c[0, 1:] - 1e-5).all() and (all_o <= c[1, 1:] + 1e-5).all():
                hit = True
                break
        assert hit, "episode rays not confined to one micro-cell"

    # different keys give different episodes
    b2 = fn(pools, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(b2["support_rays"]), sr)


def _episode_ray_ids(samplers, batch, k, t, split):
    """Recover dataset ray ids by matching unique origins."""
    ds = samplers[k].ds
    rays = np.asarray(batch[f"{split}_rays"])[k, t]
    ids = []
    for r in rays:
        m = np.nonzero((ds.rays[:, :3] == r[:3]).all(axis=1))[0]
        assert len(m) == 1
        ids.append(m[0])
    return np.asarray(ids)


def test_device_episode_constraints():
    """Image-count bounds, per-image caps, S/Q ray disjointness, and image
    disjointness (reference task_dataset.py:420-542, 682-898)."""
    samplers = make_samplers(K=1)
    pools_np = build_device_pools(samplers, max_pool=2048)
    pools = {k: jnp.asarray(v) for k, v in pools_np.items()}
    S, Q = 32, 16
    cst = EpisodeConstraints()
    fn = jax.jit(make_device_batch_fn(1, S, Q, cst))
    ds = samplers[0].ds

    for seed in range(6):
        batch = fn(pools, jax.random.PRNGKey(seed))
        s_ids = _episode_ray_ids(samplers, batch, 0, 0, "support")
        q_ids = _episode_ray_ids(samplers, batch, 0, 0, "query")

        # rays unique within each split and disjoint across S/Q
        assert len(np.unique(s_ids)) == S
        assert len(np.unique(q_ids)) == Q
        assert not np.intersect1d(s_ids, q_ids).size

        s_imgs = np.unique(ds.img_indices[s_ids])
        q_imgs = np.unique(ds.img_indices[q_ids])
        assert 1 <= len(s_imgs) <= cst.max_images_support
        assert 1 <= len(q_imgs) <= cst.max_images_query

        # per-image cap: no image provides more than ceil(cap·split)
        _, s_counts = np.unique(ds.img_indices[s_ids], return_counts=True)
        assert s_counts.max() <= int(np.ceil(cst.image_cap * S))
        _, q_counts = np.unique(ds.img_indices[q_ids], return_counts=True)
        assert q_counts.max() <= int(np.ceil(cst.image_cap * Q))

        # image disjointness when the cell has enough images
        cell_imgs_total = 12  # FakeDS images spread over all cells
        if len(s_imgs) + len(q_imgs) <= cell_imgs_total:
            assert not np.intersect1d(s_imgs, q_imgs).size


def test_host_sampler_constraints():
    """The host TaskSampler enforces the same constraints."""
    samplers = make_samplers(K=1)
    s = samplers[0]
    cst = s.constraints
    for _ in range(6):
        t = s.sample_task()
        # recover ids by origin match
        ids = []
        for r in np.concatenate([t.support_rays, t.query_rays]):
            m = np.nonzero((s.ds.rays[:, :3] == r[:3]).all(axis=1))[0]
            ids.append(m[0])
        s_ids, q_ids = np.asarray(ids[:32]), np.asarray(ids[32:])
        assert not np.intersect1d(s_ids, q_ids).size
        s_imgs = np.unique(s.ds.img_indices[s_ids])
        assert 1 <= len(s_imgs) <= cst.max_images_support
        _, cnt = np.unique(s.ds.img_indices[s_ids], return_counts=True)
        assert cnt.max() <= int(np.ceil(cst.image_cap * 32))
