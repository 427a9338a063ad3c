"""Shuffle (Normal/hash) exchange wired into SQL — VERDICT r2 item 1.

Covers on the 8-device virtual CPU mesh:
* sharded_shuffle_grouped_agg operator parity vs pandas
* ShuffleJoin operator parity vs pandas merge (non-unique keys, NULLs)
* SQL: distributed high-cardinality GROUP BY routed through the shuffle
* SQL: distributed large-large join with NON-unique build keys (the case
  broadcast refuses) matches the host path
"""

import numpy as np
import pandas as pd
import pytest

from databend_tpu.expression import Column, DataBlock


@pytest.fixture(scope="module")
def mesh():
    from databend_tpu.parallel.mesh import make_mesh
    return make_mesh()


def test_shuffle_grouped_agg_parity(mesh):
    from databend_tpu.parallel.exchange import sharded_shuffle_grouped_agg
    rng = np.random.default_rng(0)
    n = 19997  # odd: exercises padding
    raw = rng.integers(0, 3000, n)
    gids, uniq = pd.factorize(raw)
    gids = np.where(rng.random(n) < 0.03, -1, gids)  # NULL-key rows
    G = len(uniq)
    vals = np.column_stack([rng.standard_normal(n),
                            rng.integers(0, 100, n).astype(float)])
    out = sharded_shuffle_grouped_agg(mesh, gids, vals, G,
                                      ["sum", "max"])
    assert out is not None and out.shape == (G, 2)
    df = pd.DataFrame({"g": gids, "a": vals[:, 0], "b": vals[:, 1]})
    df = df[df.g >= 0]
    want_sum = df.groupby("g").a.sum().reindex(range(G)).fillna(0).to_numpy()
    want_max = (df.groupby("g").b.max().reindex(range(G))
                .fillna(-np.inf).to_numpy())
    assert np.allclose(out[:, 0], want_sum, atol=1e-2)
    assert np.allclose(out[:, 1], want_max)


def test_shuffle_join_parity(mesh):
    from databend_tpu.parallel.exchange import ShuffleJoin
    rng = np.random.default_rng(1)
    bc = rng.integers(0, 500, 3000).astype(np.int64)
    bc[rng.random(3000) < 0.05] = -1
    pc = rng.integers(0, 600, 7001).astype(np.int64)
    pc[rng.random(7001) < 0.05] = -1
    sj = ShuffleJoin(mesh, bc)
    lidx, ridx = sj.probe(pc)
    bdf = pd.DataFrame({"k": bc, "r": np.arange(len(bc))})
    pdf = pd.DataFrame({"k": pc, "l": np.arange(len(pc))})
    m = pdf[pdf.k >= 0].merge(bdf[bdf.k >= 0], on="k")
    wl, wr = m.l.to_numpy(), m.r.to_numpy()
    o = np.lexsort((wr, wl))
    assert np.array_equal(lidx, wl[o])
    assert np.array_equal(ridx, wr[o])


def test_shuffle_join_no_matches(mesh):
    from databend_tpu.parallel.exchange import ShuffleJoin
    sj = ShuffleJoin(mesh, np.arange(100, dtype=np.int64))
    lidx, ridx = sj.probe(np.full(50, -1, np.int64))
    assert len(lidx) == 0 and len(ridx) == 0


@pytest.fixture
def sctx(tmp_path):
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    rng = np.random.default_rng(7)
    n = 120_000
    c.sql("CREATE TABLE facts (uid BIGINT, grp BIGINT, v DOUBLE)")
    c.insert_block("facts", DataBlock(
        ["uid", "grp", "v"],
        [Column.from_numpy(rng.integers(0, 90_000, n)),   # ~70k+ groups
         Column.from_numpy(rng.integers(0, 300, n)),
         Column.from_numpy(rng.random(n))]))
    # build side with NON-unique keys: broadcast context must refuse it
    m = 2_000
    c.sql("CREATE TABLE events (grp BIGINT, w BIGINT)")
    c.insert_block("events", DataBlock(
        ["grp", "w"],
        [Column.from_numpy(rng.integers(0, 300, m)),
         Column.from_numpy(rng.integers(0, 10, m))]))
    return c


def _both(c, sql):
    c.sql("SET enable_distributed_execution = 0")
    host = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 1")
    dist = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 0")
    return host, dist


def test_sql_highcard_group_by_shuffle(sctx):
    # >65536 groups routes through sharded_shuffle_grouped_agg
    host, dist = _both(sctx, "SELECT uid, count(*) AS c, sum(v) AS s"
                             " FROM facts GROUP BY uid ORDER BY uid")
    assert len(host) == len(dist) > 65536
    for h, d in zip(host[:500], dist[:500]):
        assert h[0] == d[0] and h[1] == d[1]
        assert d[2] == pytest.approx(h[2], rel=1e-3)


def test_sql_large_large_join_nonunique(sctx):
    sql = ("SELECT facts.grp, count(*) AS c, sum(events.w) AS s"
           " FROM facts JOIN events ON facts.grp = events.grp"
           " GROUP BY facts.grp ORDER BY facts.grp LIMIT 50")
    host, dist = _both(sctx, sql)
    assert len(host) == len(dist) == 50
    for h, d in zip(host, dist):
        assert h[0] == d[0] and h[1] == d[1]
        assert d[2] == pytest.approx(h[2], rel=1e-6)


def test_sql_semi_join_shuffle(sctx):
    sql = ("SELECT count(*) FROM facts WHERE facts.grp IN"
           " (SELECT events.grp FROM events WHERE events.w > 5)")
    host, dist = _both(sctx, sql)
    assert host == dist


def test_sql_distributed_topn_string_and_null_keys(sctx):
    # rank compression makes ANY single sort key eligible for the
    # ordered merge exchange (strings, NULLs, wide ints)
    c = sctx
    c.sql("CREATE TABLE strs (s VARCHAR NULL, v BIGINT)")
    import numpy as np
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import String
    rng = np.random.default_rng(3)
    n = 5000
    vals = [None if rng.random() < 0.05 else f"w{rng.integers(0, 999):03d}"
            for _ in range(n)]
    c.insert_block("strs", DataBlock(
        ["s", "v"], [Column.from_pylist(vals, String.wrap_nullable()),
                     Column.from_numpy(np.arange(n))]))
    for q in ("SELECT s FROM strs ORDER BY s ASC LIMIT 7",
              "SELECT s FROM strs ORDER BY s DESC LIMIT 7",
              "SELECT v FROM strs ORDER BY v DESC LIMIT 5"):
        host, dist = _both(c, q)
        assert host == dist, (q, host, dist)
