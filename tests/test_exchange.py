"""Exchange operators on the 8-device virtual CPU mesh.

Covers the four reference exchange kinds (fragmenter.rs:238-266):
grouped merge (psum), ordered merge (top-n), broadcast, and the
all_to_all shuffle that VERDICT r1 flagged as documented-but-absent.
"""

import numpy as np
import pytest

from databend_tpu.parallel import make_mesh
from databend_tpu.parallel.exchange import (broadcast_lookup_join,
                                            shard_rows_padded,
                                            sharded_grouped_agg,
                                            sharded_topn, shuffle_by_key)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_grouped_agg_matches_numpy(mesh, rng):
    n, g = 10_000, 37
    gids = rng.integers(0, g, n)
    vals = rng.standard_normal((n, 3))
    out = sharded_grouped_agg(mesh, gids, vals, g,
                              ["sum", "min", "max"])
    for gi in range(g):
        rows = vals[gids == gi]
        assert out[gi, 0] == pytest.approx(rows[:, 0].sum(), rel=1e-4)
        assert out[gi, 1] == pytest.approx(rows[:, 1].min())
        assert out[gi, 2] == pytest.approx(rows[:, 2].max())


def test_grouped_agg_count_and_padding(mesh, rng):
    n, g = 1003, 5  # deliberately not divisible by 8
    gids = rng.integers(0, g, n)
    vals = np.ones((n, 1))
    out = sharded_grouped_agg(mesh, gids, vals, g, ["count"])
    assert out[:, 0].sum() == n
    np.testing.assert_array_equal(out[:, 0], np.bincount(gids, minlength=g))


def test_topn_asc_desc(mesh, rng):
    keys = rng.standard_normal(5000)
    ids_asc = sharded_topn(mesh, keys, 10, asc=True)
    np.testing.assert_array_equal(np.sort(keys)[:10], keys[ids_asc])
    ids_desc = sharded_topn(mesh, keys, 10, asc=False)
    np.testing.assert_array_equal(np.sort(keys)[::-1][:10], keys[ids_desc])


def test_broadcast_lookup_join(mesh, rng):
    n_build, n_probe = 500, 20_000
    build = np.arange(n_build, dtype=np.int64)
    rng.shuffle(build)
    probe = rng.integers(-5, n_build + 50, n_probe)
    out = broadcast_lookup_join(mesh, probe, build)
    for i in range(0, n_probe, 997):
        if 0 <= probe[i] < n_build:
            assert build[out[i]] == probe[i]
        else:
            assert out[i] == -1


def test_shuffle_by_key_copartitions(mesh, rng):
    n = 4096
    keys = rng.integers(0, 1000, n)
    vals = rng.standard_normal((n, 2))
    k_out, v_out, shard_of = shuffle_by_key(mesh, keys, vals)
    assert len(k_out) == n  # nothing lost
    # co-partitioning: every occurrence of a key lands on exactly one shard
    key_to_shards = {}
    for k, s in zip(k_out.tolist(), shard_of.tolist()):
        key_to_shards.setdefault(k, set()).add(s)
    assert all(len(s) == 1 for s in key_to_shards.values())
    assert all(k % 8 == next(iter(s)) for k, s in key_to_shards.items())
    # values travel with their keys
    sums_in = {}
    for k, v in zip(keys.tolist(), vals[:, 0].tolist()):
        sums_in[k] = sums_in.get(k, 0.0) + v
    sums_out = {}
    for k, v in zip(k_out.tolist(), v_out[:, 0].tolist()):
        sums_out[k] = sums_out.get(k, 0.0) + v
    for k in sums_in:
        assert sums_out[k] == pytest.approx(sums_in[k], rel=1e-4)
