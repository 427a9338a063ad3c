"""SQL-level distributed execution on the 8-device virtual CPU mesh.

VERDICT r1 item 4 done-criteria: distributed GROUP BY / top-n / broadcast
join produce identical results to the host path, and the sqllogic base
suites stay green with the distributed-plan flag on.
"""

import glob
import os

import numpy as np
import pytest

from databend_tpu.expression import Column, DataBlock

SUITES = os.path.join(os.path.dirname(__file__), "suites")


@pytest.fixture
def dctx(tmp_path):
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    rng = np.random.default_rng(11)
    n = 50_000
    c.sql("CREATE TABLE m (k BIGINT, grp BIGINT, v DOUBLE)")
    c.insert_block("m", DataBlock(
        ["k", "grp", "v"],
        [Column.from_numpy(np.arange(n)),
         Column.from_numpy(rng.integers(0, 40, n)),
         Column.from_numpy(rng.random(n))]))
    c.sql("CREATE TABLE dim (grp BIGINT, tag BIGINT)")
    c.insert_block("dim", DataBlock(
        ["grp", "tag"],
        [Column.from_numpy(np.arange(40)),
         Column.from_numpy(np.arange(40) % 7)]))
    return c


def _both(c, sql):
    c.sql("SET enable_distributed_execution = 0")
    host = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 1")
    dist = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 0")
    return host, dist


def test_distributed_group_by(dctx):
    host, dist = _both(dctx, "SELECT grp, count(*), sum(v), min(v), max(v),"
                             " avg(v) FROM m GROUP BY grp ORDER BY grp")
    assert len(host) == len(dist) == 40
    for h, d in zip(host, dist):
        assert h[0] == d[0] and h[1] == d[1]
        for j in (2, 3, 4, 5):
            assert d[j] == pytest.approx(h[j], rel=1e-4)


def test_distributed_global_agg(dctx):
    host, dist = _both(dctx, "SELECT count(*), sum(v) FROM m")
    assert dist[0][0] == host[0][0]
    assert dist[0][1] == pytest.approx(host[0][1], rel=1e-4)


def test_distributed_topn(dctx):
    host, dist = _both(dctx, "SELECT k, v FROM m ORDER BY v LIMIT 7")
    assert host == dist
    host, dist = _both(dctx, "SELECT k, v FROM m ORDER BY v DESC LIMIT 7")
    assert host == dist


def test_distributed_topn_multi_key(dctx):
    """Multi-key ORDER BY ... LIMIT rides the merge exchange via one
    composite lexsort rank (round-4 widening of the single-key gate)."""
    from databend_tpu.parallel import exchange as ex
    calls = {"n": 0}
    orig = ex.sharded_topn

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)
    ex.sharded_topn = spy
    try:
        host, dist = _both(dctx, "SELECT grp, k, v FROM m"
                                 " ORDER BY grp, v DESC LIMIT 9")
        assert host == dist
        host, dist = _both(dctx, "SELECT k, grp, v FROM m"
                                 " ORDER BY k DESC, grp, v LIMIT 5")
        assert host == dist
    finally:
        ex.sharded_topn = orig
    assert calls["n"] >= 2


def test_distributed_broadcast_join(dctx):
    q = ("SELECT count(*), sum(tag) FROM m JOIN dim ON m.grp = dim.grp "
         "WHERE v < 0.5")
    host, dist = _both(dctx, q)
    assert dist[0][0] == host[0][0]
    assert dist[0][1] == host[0][1]


def test_distributed_left_join_and_fallback(dctx):
    # LEFT join goes through the broadcast path's unmatched handling
    dctx.sql("CREATE TABLE dim2 (grp BIGINT, w BIGINT)")
    dctx.insert_block("dim2", DataBlock(
        ["grp", "w"],
        [Column.from_numpy(np.arange(0, 20)),  # only half the groups
         Column.from_numpy(np.arange(20) * 10)]))
    q = ("SELECT count(*), count(w) FROM m LEFT JOIN dim2 "
         "ON m.grp = dim2.grp")
    host, dist = _both(dctx, q)
    assert host == dist
    # duplicate build keys must fall back to the host hash join
    dctx.sql("INSERT INTO dim2 VALUES (0, 999)")
    q2 = "SELECT count(*) FROM m JOIN dim2 ON m.grp = dim2.grp"
    host, dist = _both(dctx, q2)
    assert host == dist


def test_sqllogic_base_suites_distributed(tmp_path):
    """The behavioral spec corpus passes with the distributed flag on."""
    from databend_tpu.service.session import SessionContext
    from databend_tpu.testing.sqllogic import run_file
    for path in sorted(glob.glob(os.path.join(SUITES, "base", "*.test"))):
        c = SessionContext(data_root=str(tmp_path / os.path.basename(path)))
        c.sql("SET GLOBAL enable_distributed_execution = 1")
        run_file(c, path)


def _both_asserting_device(c, sql, monkeypatch):
    """Like _both, but assert the distributed device-agg path actually ran
    (no silent host fallback)."""
    from databend_tpu.pipeline import executor as ex
    hits = []
    orig = ex._try_distributed_aggregate

    def spy(plan, buffered, final_n):
        out = orig(plan, buffered, final_n)
        hits.append(out is not None)
        return out

    monkeypatch.setattr(ex, "_try_distributed_aggregate", spy)
    host, dist = _both(c, sql)
    assert any(hits), "distributed aggregate path never engaged"
    assert hits[-1], "distributed aggregate fell back to host"
    return host, dist


def test_distributed_variance_family(dctx, monkeypatch):
    host, dist = _both_asserting_device(
        dctx, "SELECT grp, var_pop(v), var_samp(v), stddev_pop(v),"
              " stddev_samp(v) FROM m GROUP BY grp ORDER BY grp",
        monkeypatch)
    assert len(host) == len(dist) == 40
    for h, d in zip(host, dist):
        for j in (1, 2, 3, 4):
            assert d[j] == pytest.approx(h[j], rel=1e-3)


def test_distributed_distinct_aggregates(dctx, monkeypatch):
    dctx.sql("CREATE TABLE dd (grp BIGINT, x BIGINT)")
    rng = np.random.default_rng(3)
    n = 20_000
    dctx.insert_block("dd", DataBlock(
        ["grp", "x"],
        [Column.from_numpy(rng.integers(0, 25, n)),
         Column.from_numpy(rng.integers(0, 200, n))]))
    host, dist = _both_asserting_device(
        dctx, "SELECT grp, count(DISTINCT x), sum(DISTINCT x),"
              " avg(DISTINCT x), min(x), max(x) FROM dd GROUP BY grp"
              " ORDER BY grp", monkeypatch)
    assert len(host) == len(dist) == 25
    for h, d in zip(host, dist):
        assert d[0] == h[0] and d[1] == h[1]
        assert d[2] == pytest.approx(h[2], rel=1e-4)
        assert d[3] == pytest.approx(h[3], rel=1e-4)
        assert (d[4], d[5]) == (h[4], h[5])


def test_distributed_string_minmax(dctx, monkeypatch):
    dctx.sql("CREATE TABLE ds (grp BIGINT, s VARCHAR)")
    rng = np.random.default_rng(7)
    n = 10_000
    words = np.array(["w%04d" % i for i in range(400)], object)
    vals = words[rng.integers(0, 400, n)]
    validity = rng.random(n) > 0.05
    from databend_tpu.types import String
    vals_list = [v if ok else None for v, ok in zip(vals, validity)]
    dctx.insert_block("ds", DataBlock(
        ["grp", "s"],
        [Column.from_numpy(rng.integers(0, 25, n)),
         Column.from_pylist(vals_list, String.wrap_nullable())]))
    host, dist = _both_asserting_device(
        dctx, "SELECT grp, min(s), max(s) FROM ds GROUP BY grp"
              " ORDER BY grp", monkeypatch)
    assert host == dist


def test_distributed_mixed_plain_and_special(dctx, monkeypatch):
    # Plain sum/count next to DISTINCT in one aggregate plan
    host, dist = _both_asserting_device(
        dctx, "SELECT grp, sum(v), count(DISTINCT k) FROM m GROUP BY grp"
              " ORDER BY grp", monkeypatch)
    for h, d in zip(host, dist):
        assert d[0] == h[0] and d[2] == h[2]
        assert d[1] == pytest.approx(h[1], rel=1e-4)


def _both_asserting_join_fused(c, sql, monkeypatch):
    """Assert the join-fused aggregate fragment actually ran (the join
    output never materialized) and matches the host path."""
    from databend_tpu.parallel import fragmenter as fr
    hits = []
    orig = fr.AggTopNFragment._execute_join_fused

    def spy(self, mesh):
        out = orig(self, mesh)
        hits.append(out is not fr._JOIN_FUSE_INELIGIBLE and out is not None)
        return out

    monkeypatch.setattr(fr.AggTopNFragment, "_execute_join_fused", spy)
    host, dist = _both(c, sql)
    assert hits and hits[-1], "join-fused fragment did not engage"
    return host, dist


def _rows_close(host, dist, rel=1e-5):
    assert len(host) == len(dist)
    for h, d in zip(host, dist):
        for a, b in zip(h, d):
            if isinstance(a, float):
                assert b == pytest.approx(a, rel=rel)
            else:
                assert a == b


@pytest.fixture
def jctx(dctx):
    rng = np.random.default_rng(5)
    dctx.sql("CREATE TABLE dimw (grp BIGINT, tag BIGINT, w DOUBLE)")
    dctx.insert_block("dimw", DataBlock(
        ["grp", "tag", "w"],
        [Column.from_numpy(np.arange(40)),
         Column.from_numpy(np.arange(40) % 7),
         Column.from_numpy(rng.random(40))]))
    dctx.sql("CREATE TABLE dupd (grp BIGINT, u DOUBLE)")
    dctx.insert_block("dupd", DataBlock(
        ["grp", "u"],
        [Column.from_numpy(np.repeat(np.arange(20), 3)),
         Column.from_numpy(rng.random(60))]))
    return dctx


def test_join_fused_build_side_keys(jctx, monkeypatch):
    host, dist = _both_asserting_join_fused(
        jctx, "SELECT tag, sum(v) AS s, count(*) AS c FROM m"
              " JOIN dimw ON m.grp = dimw.grp GROUP BY tag"
              " ORDER BY s DESC LIMIT 5", monkeypatch)
    _rows_close(host, dist)


def test_join_fused_mixed_keys_and_build_arg(jctx, monkeypatch):
    host, dist = _both_asserting_join_fused(
        jctx, "SELECT tag, m.grp, sum(w) AS sw, avg(v) AS av FROM m"
              " JOIN dimw ON m.grp = dimw.grp GROUP BY tag, m.grp"
              " ORDER BY av DESC LIMIT 7", monkeypatch)
    _rows_close(host, dist)


def test_join_fused_having(jctx, monkeypatch):
    host, dist = _both_asserting_join_fused(
        jctx, "SELECT tag, count(*) AS c FROM m"
              " JOIN dimw ON m.grp = dimw.grp GROUP BY tag"
              " HAVING count(*) > 5000 ORDER BY c LIMIT 4", monkeypatch)
    _rows_close(host, dist)


def test_join_fused_nonunique_build(jctx, monkeypatch):
    # each probe row matches 3 build rows: the pair expansion path
    host, dist = _both_asserting_join_fused(
        jctx, "SELECT m.grp, sum(u) AS su, count(*) AS c FROM m"
              " JOIN dupd ON m.grp = dupd.grp GROUP BY m.grp"
              " ORDER BY su DESC LIMIT 6", monkeypatch)
    _rows_close(host, dist)


def test_join_fused_minmax_and_filter(jctx, monkeypatch):
    host, dist = _both_asserting_join_fused(
        jctx, "SELECT tag, min(v) AS mn, max(v) AS mx FROM m"
              " JOIN dimw ON m.grp = dimw.grp WHERE m.grp < 10"
              " GROUP BY tag ORDER BY mn LIMIT 3", monkeypatch)
    _rows_close(host, dist)


def test_distributed_fullsort_range_partition(dctx):
    """ORDER BY without LIMIT rides the range-partition (sample-sort)
    exchange: splitter-routed all_to_all + per-shard device sort +
    ordered concat (reference: distributed sort fragments,
    fragmenter.rs:59,209). Results must be identical to the host sort
    and the exchange must actually fire."""
    from databend_tpu.utils.metrics import METRICS
    c = dctx
    for q in ("SELECT k, v FROM m ORDER BY v",
              "SELECT grp, v FROM m ORDER BY grp DESC, v",
              "SELECT v FROM m ORDER BY v DESC"):
        c.sql("SET enable_distributed_execution = 0")
        host = c.sql(q).rows()
        before = METRICS.snapshot().get("distributed_fullsort_queries", 0)
        c.sql("SET enable_distributed_execution = 1")
        dist = c.sql(q).rows()
        after = METRICS.snapshot().get("distributed_fullsort_queries", 0)
        assert after == before + 1, f"fullsort exchange did not fire: {q}"
        assert host == dist, q


def test_distributed_window_partition_hash(dctx):
    """Window functions ride the partition-hash exchange: PARTITION BY
    codes all_to_all-routed so each partition lands wholly on one shard,
    per-shard vectorized window, inverse-permute (reference:
    window_partition shuffle)."""
    from databend_tpu.utils.metrics import METRICS
    c = dctx
    for q in (
        "SELECT k, sum(v) OVER (PARTITION BY grp) AS sv FROM m"
        " ORDER BY k LIMIT 50",
        "SELECT k, row_number() OVER (PARTITION BY grp ORDER BY v)"
        " AS rn, avg(v) OVER (PARTITION BY grp) AS av FROM m"
        " ORDER BY k LIMIT 50",
    ):
        c.sql("SET enable_distributed_execution = 0")
        host = c.sql(q).rows()
        before = METRICS.snapshot().get("distributed_window_queries", 0)
        c.sql("SET enable_distributed_execution = 1")
        dist = c.sql(q).rows()
        after = METRICS.snapshot().get("distributed_window_queries", 0)
        assert after == before + 1, f"window exchange did not fire: {q}"
        assert host == dist, q


def test_distributed_multi_exchange_plan(dctx):
    """One query crossing MULTIPLE exchange kinds: window
    (partition-hash) feeding a final distributed sort — the multi-
    exchange plan shape the reference fragments into several fragments
    (fragmenter.rs:59)."""
    from databend_tpu.utils.metrics import METRICS
    c = dctx
    q = ("SELECT grp, v, sum(v) OVER (PARTITION BY grp) AS sv FROM m"
         " WHERE k < 20000 ORDER BY sv, v")
    c.sql("SET enable_distributed_execution = 0")
    host = c.sql(q).rows()
    snap0 = METRICS.snapshot()
    c.sql("SET enable_distributed_execution = 1")
    dist = c.sql(q).rows()
    snap1 = METRICS.snapshot()
    assert snap1.get("distributed_window_queries", 0) \
        == snap0.get("distributed_window_queries", 0) + 1
    assert snap1.get("distributed_fullsort_queries", 0) \
        == snap0.get("distributed_fullsort_queries", 0) + 1
    assert host == dist
