"""Device-resident episodic sampling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from acn_tpu.data.tasks import TaskSampler, build_device_pools
from acn_tpu.pipelines.offline_stage.train_step import make_device_batch_fn


class FakeDS:
    def __init__(self, n=4000, seed=0, y_range=(-1, 1)):
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
        self.img_indices = np.zeros(n, np.int32)


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
    # every eligible cell has a positive pool size
    assert np.all(pools["pool_size"][pools["eligible"]] > 0)
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


def test_window_sampling_is_replacement_free():
    samplers = make_samplers(K=1)
    pools_np = build_device_pools(samplers, max_pool=512)
    pools = {k: jnp.asarray(v) for k, v in pools_np.items()}
    S, Q = 32, 16
    fn = jax.jit(make_device_batch_fn(1, S, Q))
    batch = fn(pools, jax.random.PRNGKey(0))
    rays = np.concatenate(
        [np.asarray(batch["support_rays"])[0, 0], np.asarray(batch["query_rays"])[0, 0]]
    )
    # origins unique per ray in FakeDS ⇒ uniqueness check valid (pool > S+Q)
    uniq = np.unique(rays[:, :3], axis=0)
    assert len(uniq) == S + Q
