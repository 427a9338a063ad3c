"""Multi-chip sharding paths on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from databend_tpu.parallel import (make_mesh, query_sharding, replicated,
                                   shard_rows, sharded_brute_force_topk,
                                   sharded_kmeans_step, sharded_partial_agg)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, dp=2)


def test_sharded_topk_matches_single_device(mesh, rng):
    n, d, b, k = 4096, 32, 8, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    x_dev, n_valid = shard_rows(x, mesh)
    assert n_valid == n
    q_dev = jax.device_put(q, query_sharding(mesh))
    dists, ids = sharded_brute_force_topk(mesh, q_dev, x_dev, k, "l2")

    # exact reference
    dd = np.linalg.norm(x[None, :, :] - q[:, None, :], axis=-1)
    ref_ids = np.argsort(dd, axis=1)[:, :k]
    ids_np = np.asarray(ids)
    for j in range(b):
        assert set(ids_np[j].tolist()) == set(ref_ids[j].tolist())
    assert np.allclose(np.sort(dd, axis=1)[:, :k], np.asarray(dists), atol=1e-3)


def test_sharded_topk_pads_uneven_corpus(mesh, rng):
    n, d, b, k = 1000, 16, 4, 5  # 1000 not divisible by 4 shards
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:b] + 0.01
    x_dev, n_valid = shard_rows(x, mesh)
    assert n_valid == n
    q_dev = jax.device_put(q, query_sharding(mesh))
    dists, ids = sharded_brute_force_topk(mesh, q_dev, x_dev, k, "cosine")
    ids_np = np.asarray(ids)
    assert ids_np.max() < x_dev.shape[0]
    # nearest neighbor of q[j] is row j itself
    assert all(ids_np[j, 0] == j for j in range(b))


def test_sharded_partial_agg(mesh, rng):
    x = rng.standard_normal((800, 4)).astype(np.float32)
    from databend_tpu.parallel.mesh import corpus_sharding
    x_dev = jax.device_put(x, corpus_sharding(mesh))
    s = sharded_partial_agg(mesh, x_dev, "sum")
    assert np.allclose(np.asarray(s), x.sum(0), atol=1e-3)
    mx = sharded_partial_agg(mesh, x_dev, "max")
    assert np.allclose(np.asarray(mx), x.max(0))


def test_sharded_kmeans_step_matches_host(mesh, rng):
    n, d, c = 512, 8, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    cent = x[:c].copy()
    from databend_tpu.parallel.mesh import corpus_sharding
    x_dev = jax.device_put(x, corpus_sharding(mesh))
    cent_dev = jax.device_put(cent, replicated(mesh))
    new, counts = sharded_kmeans_step(mesh, x_dev, cent_dev)

    dd = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    assign = dd.argmin(1)
    exp = cent.copy()
    for ci in range(c):
        m = assign == ci
        if m.any():
            exp[ci] = x[m].mean(0)
    assert np.allclose(np.asarray(new), exp, atol=1e-4)
    assert int(np.asarray(counts).sum()) == n


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    fn, args = g.entry()
    d, i = jax.jit(fn)(*args)
    assert d.shape[1] == 10


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
