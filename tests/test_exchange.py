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


# ----------------------------------------------------- pipe width resize
# (reference: Pipeline::resize pipes, src/query/pipeline/src/core/pipeline.rs)

def test_resize_width_narrows_and_masks(mesh, rng):
    import jax
    from databend_tpu.parallel.exchange import resize_width

    n = 800
    x = np.arange(n, dtype=np.float32)
    x_dev, n_valid = shard_rows_padded(mesh, x, fill=-1.0)
    assert n_valid == n
    y, cap = resize_width(mesh, x_dev, n, width=2, fill=-1.0)
    # cap rows per shard; the n-row prefix occupies exactly 2 shards
    assert cap == 400 and y.shape[0] == 8 * cap
    host = np.asarray(y)
    np.testing.assert_array_equal(host[:n], x)
    assert (host[n:] == -1.0).all()
    # data physically lives on only the first two devices
    nonempty = [i for i, sh in enumerate(
        sorted(y.addressable_shards, key=lambda s: s.index[0].start))
        if (np.asarray(sh.data) != -1.0).any()]
    assert nonempty == [0, 1]


def test_resize_width_widen_roundtrip(mesh, rng):
    from databend_tpu.parallel.exchange import rebalance, resize_width

    n = 600
    x = rng.standard_normal((n, 3)).astype(np.float32)
    x_dev, _ = shard_rows_padded(mesh, x)
    narrow, cap1 = resize_width(mesh, x_dev, n, width=3)
    wide, cap2 = rebalance(mesh, narrow, n)
    assert cap2 == 75  # 600 rows back across all 8 shards
    np.testing.assert_allclose(np.asarray(wide)[:n], x, rtol=1e-6)


def test_resize_composes_with_downstream_shard_map(mesh, rng):
    """A narrowed pipe feeds a width-aware downstream stage: slots past
    the new width see only fill and are masked, like the reference's
    dummy output ports on a narrowed pipe."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from databend_tpu.parallel.exchange import SHARD_AXIS, resize_width

    n, width = 1000, 4
    x = rng.random(n).astype(np.float32)
    x_dev, _ = shard_rows_padded(mesh, x, fill=0.0)
    y, cap = resize_width(mesh, x_dev, n, width=width, fill=0.0)

    def local(chunk):
        return jax.lax.psum(jnp.sum(chunk), SHARD_AXIS)[None]

    total = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(SHARD_AXIS),), out_specs=P(SHARD_AXIS),
        check_vma=False))(y)
    np.testing.assert_allclose(float(np.asarray(total)[0]), x.sum(),
                               rtol=1e-4)


def test_resize_width_validates(mesh):
    from databend_tpu.parallel.exchange import resize_width
    x_dev, _ = shard_rows_padded(mesh, np.arange(16, dtype=np.float32))
    with pytest.raises(ValueError):
        resize_width(mesh, x_dev, 16, width=0)
    with pytest.raises(ValueError):
        resize_width(mesh, x_dev, 16, width=9)
