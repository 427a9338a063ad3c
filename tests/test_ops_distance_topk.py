import jax.numpy as jnp
import numpy as np
import pytest

from databend_tpu.ops import (
    brute_force_topk,
    chunked_topk_smallest,
    cosine_distance,
    inner_product,
    l1_distance,
    l2_distance,
    l2_distance_squared,
    merge_topk,
    pairwise_distance,
    topk_smallest,
)
from databend_tpu.ops.distance import rowwise_distance
from databend_tpu.ops.topk import pad_corpus


def ref_dists(q, x, metric):
    q = q.astype(np.float64)
    x = x.astype(np.float64)
    if metric == "ip":
        return -(q @ x.T)
    if metric == "l2":
        return np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    if metric == "l2_sq":
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if metric == "l1":
        return np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        return 1.0 - qn @ xn.T
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["cosine", "l2", "l2_sq", "l1", "ip"])
def test_pairwise_matches_numpy(rng, metric):
    q = rng.normal(size=(5, 16)).astype(np.float32)
    x = rng.normal(size=(37, 16)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), metric))
    want = ref_dists(q, x, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["cosine", "l2", "l1", "ip"])
def test_rowwise_matches_numpy(rng, metric):
    a = rng.normal(size=(9, 8)).astype(np.float32)
    b = rng.normal(size=(9, 8)).astype(np.float32)
    got = np.asarray(rowwise_distance(jnp.asarray(a), jnp.asarray(b), metric))
    want = np.diag(ref_dists(a, b, metric)) if metric != "ip" else (a.astype(np.float64) * b).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_l1_chunked_path(rng):
    q = rng.normal(size=(3, 8)).astype(np.float32)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    got = np.asarray(l1_distance(jnp.asarray(q), jnp.asarray(x), chunk=16))
    np.testing.assert_allclose(got, ref_dists(q, x, "l1"), rtol=1e-4, atol=1e-4)


def test_topk_smallest_exact(rng):
    d = rng.normal(size=(4, 50)).astype(np.float32)
    vals, pos = topk_smallest(jnp.asarray(d), 5)
    want_pos = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(pos), want_pos)
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(d, want_pos, 1))


def test_topk_with_ids(rng):
    d = rng.normal(size=(2, 10)).astype(np.float32)
    ids = jnp.arange(10, dtype=jnp.int32) + 100
    vals, got_ids = topk_smallest(jnp.asarray(d), 3, ids=ids)
    want = np.argsort(d, axis=1)[:, :3] + 100
    np.testing.assert_array_equal(np.asarray(got_ids), want)


def test_chunked_topk_matches_full(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    x = rng.normal(size=(256, 16)).astype(np.float32)
    vc, ic = chunked_topk_smallest(jnp.asarray(q), jnp.asarray(x), 10, "l2", chunk_rows=64)
    full = ref_dists(q, x, "l2")
    want_ids = np.argsort(full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ic), want_ids)
    np.testing.assert_allclose(np.asarray(vc),
                               np.take_along_axis(full, want_ids, 1), rtol=1e-4, atol=1e-4)


def test_merge_topk(rng):
    # two shards, each with local top-3; merge to global top-3
    d = rng.normal(size=(2, 4, 3)).astype(np.float32)  # [S=2, B=4, k=3]
    ids = rng.integers(0, 1000, size=(2, 4, 3)).astype(np.int32)
    vals, mids = merge_topk(jnp.asarray(d), jnp.asarray(ids), 3)
    flat_d = np.transpose(d, (1, 0, 2)).reshape(4, 6)
    flat_i = np.transpose(ids, (1, 0, 2)).reshape(4, 6)
    order = np.argsort(flat_d, axis=1)[:, :3]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(flat_d, order, 1))
    np.testing.assert_array_equal(np.asarray(mids), np.take_along_axis(flat_i, order, 1))


def test_pad_corpus(rng):
    x = rng.normal(size=(100, 8)).astype(np.float32)
    xp, n = pad_corpus(x, 64)
    assert xp.shape[0] == 128 and n == 100


def test_brute_force_topk_end_to_end(rng):
    q = rng.normal(size=(8, 32)).astype(np.float32)
    x = rng.normal(size=(500, 32)).astype(np.float32)
    xp, n = pad_corpus(x, 128)
    vals, ids = brute_force_topk(jnp.asarray(q), jnp.asarray(xp), 10, "l2", chunk_rows=128)
    ids = np.asarray(ids)
    assert (ids < n).all(), "padding rows must never win"
    full = ref_dists(q, x, "l2")
    want = np.argsort(full, axis=1)[:, :10]
    np.testing.assert_array_equal(ids, want)


def test_brute_force_topk_bf16_recall(rng):
    # bf16 scoring must still get ~all of top-10 right on separated data
    q = rng.normal(size=(4, 64)).astype(np.float32)
    x = rng.normal(size=(512, 64)).astype(np.float32)
    vals, ids = brute_force_topk(jnp.asarray(q), jnp.asarray(x), 10, "l2",
                                 chunk_rows=512, bf16=True)
    full = ref_dists(q, x, "l2")
    want = set(map(tuple, np.dstack([np.arange(4)[:, None].repeat(10, 1),
                                     np.argsort(full, 1)[:, :10]]).reshape(-1, 2).tolist()))
    got = set(map(tuple, np.dstack([np.arange(4)[:, None].repeat(10, 1),
                                    np.asarray(ids)]).reshape(-1, 2).tolist()))
    recall = len(got & want) / len(want)
    assert recall >= 0.9, recall
