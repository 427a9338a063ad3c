"""Single-chip device scan-aggregate route (pipeline/device_scan_agg.py).

The route compiles Scan->Filter->Aggregate onto the device over
HBM-resident column forms; these tests force it on (min_rows=0) and
assert results are IDENTICAL to the host path — the exactness claim
(base-256 limb sums) is load-bearing, so sums compare exactly, not
within a tolerance. Reference behavior: aggregation inside the pipeline
executor (query_pipeline_executor.rs:62)."""

import tempfile

import numpy as np
import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import Column, DataBlock
from databend_tpu.types import Date, Float64, Int64, String
from databend_tpu.utils.metrics import METRICS


def _routed():
    return METRICS.snapshot().get("device_scan_agg_queries", 0)


@pytest.fixture()
def ctx():
    c = SessionContext(data_root=tempfile.mkdtemp())
    c.sql("set device_scan_agg_min_rows = 0")
    yield c


def _mkdata(ctx, n=5000, seed=0):
    rng = np.random.default_rng(seed)
    ks = rng.choice(["A", "B", "C"], n)
    k2 = rng.integers(0, 2, n)
    d = rng.integers(10000, 12000, n)
    q = rng.integers(1, 51, n).astype(float)
    p = (rng.random(n) * 1000).round(2)
    x = rng.integers(0, 100, n).astype(object)
    x[rng.random(n) < 0.1] = None
    neg = (rng.random(n) * 20 - 10).round(2)
    ctx.sql("create table t (k string, k2 int, d date, q double,"
            " p double, x int null, neg double)")
    cols = [Column.from_pylist(list(ks), String),
            Column(Int64, k2.astype(np.int64)),
            Column(Date, d.astype(np.int32)),
            Column(Float64, q), Column(Float64, p),
            Column.from_pylist(list(x), Int64.wrap_nullable()),
            Column(Float64, neg)]
    ctx.insert_block("t", DataBlock(["k", "k2", "d", "q", "p", "x", "neg"],
                                    cols, n))


def _both(ctx, sql):
    ctx.sql("set enable_device_local_execution = 0")
    host = ctx.sql(sql).rows()
    ctx.sql("set enable_device_local_execution = 1")
    before = _routed()
    dev = ctx.sql(sql).rows()
    assert _routed() == before + 1, f"route did not engage for: {sql}"
    return host, dev


def _assert_same(host, dev):
    assert len(host) == len(dev)
    for hr, dr in zip(host, dev):
        assert len(hr) == len(dr)
        for a, b in zip(hr, dr):
            if isinstance(a, float) and isinstance(b, float):
                # sums/avgs must agree to f64 round-off of the HOST path
                assert b == pytest.approx(a, rel=1e-12, abs=1e-9), (hr, dr)
            else:
                assert a == b, (hr, dr)


def test_grouped_all_agg_kinds(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, k2, sum(q) s1, sum(p) s2, sum(p*(1-q/100)) s3,
               avg(p) a1, count(*) c, count(x) cx, sum(x) sx,
               min(p) mp, max(d) md, min(k) mk, sum(neg) sn
        from t where d <= to_date('2002-09-02') and k <> 'C'
        group by k, k2 order by k, k2""")
    _assert_same(host, dev)


def test_filter_shapes(ctx):
    _mkdata(ctx)
    for cond in ["d > to_date('1999-05-05')", "k = 'A'", "k2 = 1",
                 "q >= 10 and q < 40", "x is null", "x is not null",
                 "not (k = 'B')", "k = 'A' or k2 = 0",
                 "p <= 500.25 and neg > -5"]:
        host, dev = _both(
            ctx, f"select k, count(*), sum(p) from t where {cond}"
                 " group by k order by k")
        _assert_same(host, dev)


def test_global_aggregate_and_empty(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, "select sum(p), avg(q), count(*), count(x),"
                           " min(d), max(p) from t where k <> 'Z'")
    _assert_same(host, dev)
    # empty filter result: count 0, sums/min/max NULL
    host, dev = _both(ctx, "select sum(p), count(*), min(d) from t"
                           " where d < to_date('1970-01-02')")
    _assert_same(host, dev)
    assert dev == [(None, 0, None)]


def test_exactness_beats_host_f64(ctx):
    """The limb path is exact where host f64 accumulation rounds: the
    device sum of 2-decimal values is the true decimal sum."""
    n = 20000
    vals = np.full(n, 0.1)
    ctx.sql("create table e (v double)")
    ctx.insert_block("e", DataBlock(["v"], [Column(Float64, vals)], n))
    ctx.sql("set enable_device_local_execution = 1")
    before = _routed()
    (got,) = ctx.sql("select sum(v) from e").rows()[0]
    assert _routed() == before + 1
    assert got == 2000.0  # exactly; np.sum of f64 0.1s drifts


def test_negative_values_and_bias(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, "select k, sum(neg), min(neg), max(neg)"
                           " from t group by k order by k")
    _assert_same(host, dev)


def test_multi_chunk(ctx, monkeypatch):
    import databend_tpu.pipeline.device_scan_agg as dsa
    monkeypatch.setattr(dsa, "CHUNK_ROWS", 777)
    _mkdata(ctx, n=3000)
    host, dev = _both(ctx, """
        select k, sum(p), count(*), min(p), max(d), sum(x)
        from t where q < 40 group by k order by k""")
    _assert_same(host, dev)


def test_snapshot_isolation(ctx):
    """New snapshot -> new resident forms; results track the new data."""
    _mkdata(ctx, n=2000)
    ctx.sql("set enable_device_local_execution = 1")
    r1 = ctx.sql("select count(*) from t where q < 100").rows()
    ctx.sql("insert into t select * from t")
    r2 = ctx.sql("select count(*) from t where q < 100").rows()
    assert r2[0][0] == 2 * r1[0][0]


def test_bails_to_host(ctx):
    """Ineligible shapes must fall back, not fail: grids beyond every
    engine cap, min/max above mask+sort caps, non-column distinct."""
    _mkdata(ctx)
    ctx.sql("set enable_device_local_execution = 1")
    ctx.sql("set device_scan_agg_max_groups_matmul = 64")
    ctx.sql("set device_scan_agg_max_groups_sort = 64")
    before = _routed()
    # high-card group (q x p grid blows every grid cap)
    ctx.sql("select q, p, count(*) from t group by q, p limit 3").rows()
    # min/max above the mask cap ride only the SORT engine — with the
    # sort cap lowered they must bail even under a high matmul cap
    ctx.sql("set device_scan_agg_max_groups_matmul = 1000000")
    ctx.sql("set device_scan_agg_max_groups = 2")
    ctx.sql("set device_scan_agg_max_groups_sort = 2")
    ctx.sql("select k, min(p), count(*) from t group by k").rows()
    # DISTINCT over an expression (not a bound column) is host-only
    ctx.sql("select k, count(distinct q + 1) from t group by k").rows()
    assert _routed() == before
    err = METRICS.snapshot().get("device_scan_agg_errors", 0)
    assert err == 0


def test_sort_engine_large_grid(ctx):
    """Grids above the matmul cap ride the sort engine (lax.sort +
    segment prefix sums), including MIN/MAX — exact vs host."""
    _mkdata(ctx)
    ctx.sql("set device_scan_agg_max_groups = 2")
    ctx.sql("set device_scan_agg_max_groups_matmul = 2")  # force sort
    host, dev = _both(ctx, """
        select k, k2, d, count(*), sum(p), min(p), max(d), sum(x),
               count(x), avg(neg)
        from t where q < 45 group by k, k2, d order by k, k2, d""")
    _assert_same(host, dev)


def test_count_distinct_routes(ctx):
    """COUNT(DISTINCT col) rides the two-phase sort pipeline on every
    engine; exact vs host, NULLs excluded."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, count(distinct k2), count(distinct x), count(*)
        from t group by k order by k""")
    _assert_same(host, dev)
    # global (no GROUP BY)
    host, dev = _both(ctx, "select count(distinct q), count(distinct x)"
                           " from t where k <> 'B'")
    _assert_same(host, dev)


def test_count_distinct_large_grid_and_chunks(ctx, monkeypatch):
    """Distinct counts stay exact across row chunks (the two-phase
    pipeline concatenates chunks on device before the sort)."""
    import databend_tpu.pipeline.device_scan_agg as dsa
    monkeypatch.setattr(dsa, "CHUNK_ROWS", 999)
    _mkdata(ctx, n=4000)
    ctx.sql("set device_scan_agg_max_groups = 2")  # force matmul/sort
    host, dev = _both(ctx, """
        select k, d, count(distinct x), count(*), sum(p)
        from t group by k, d order by k, d""")
    _assert_same(host, dev)


def test_like_predicate_routes_via_lut(ctx):
    """LIKE / NOT LIKE on a string column ride the dictionary LUT
    (VERDICT r4 item 3): evaluate once over the uniques, gather on
    device; results equal the host path exactly."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, count(*), sum(p) from t
        where k like 'A%' or k like '%C' group by k order by k""")
    _assert_same(host, dev)
    host, dev = _both(ctx, """
        select count(*), sum(q) from t where k not like 'B%'""")
    _assert_same(host, dev)


def test_expression_group_key_routes(ctx):
    """Single-column expression group keys re-code through an i32 LUT
    (ClickBench q28's REGEXP_REPLACE-style key)."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select upper(k) as u, count(*), sum(p) from t
        group by u order by u""")
    _assert_same(host, dev)
    host, dev = _both(ctx, """
        select concat(k, '_') as u, count(*) from t
        where q < 30 group by u order by u""")
    _assert_same(host, dev)


def test_matmul_engine_large_grid(ctx):
    """Grids above device_scan_agg_max_groups ride the one-hot int8
    matmul engine with exact i8-limb sums."""
    _mkdata(ctx)
    ctx.sql("set device_scan_agg_max_groups = 4")  # force matmul engine
    host, dev = _both(ctx, """
        select k, k2, d, count(*), sum(p), sum(x), count(x), avg(neg)
        from t where q < 45 group by k, k2, d order by k, k2, d""")
    _assert_same(host, dev)


def test_matmul_engine_negative_and_null_sums(ctx):
    _mkdata(ctx)
    ctx.sql("set device_scan_agg_max_groups = 1")
    host, dev = _both(ctx, """
        select d, sum(neg), sum(x), count(*) from t
        group by d order by d""")
    _assert_same(host, dev)


def test_route_respects_min_rows(ctx):
    _mkdata(ctx, n=500)
    ctx.sql("set device_scan_agg_min_rows = 1000000")
    before = _routed()
    ctx.sql("select k, count(*) from t group by k").rows()
    assert _routed() == before


def test_computed_agg_arg_via_lut_planes(ctx):
    """SUM/AVG over single-column expressions (AVG(length(url)) —
    ClickBench q27/q28) compile to fixed-point planes over the
    dictionary, gathered on device by rank code."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, avg(length(k)), sum(length(k) + 2), count(*)
        from t where q < 40 group by k order by k""")
    _assert_same(host, dev)


def test_computed_agg_arg_nullable_lut(ctx):
    """LUT planes over a nullable column: NULL inputs are skipped by
    SUM/AVG/COUNT exactly as the host does."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(x * 2 + 1), count(x), avg(x) from t
        group by k order by k""")
    _assert_same(host, dev)


def test_computed_agg_arg_matmul_engine(ctx):
    _mkdata(ctx)
    ctx.sql("set device_scan_agg_max_groups = 1")  # force matmul
    host, dev = _both(ctx, """
        select d, avg(length(k)), sum(x), count(*) from t
        group by d order by d""")
    _assert_same(host, dev)


def test_topn_pushdown_blocked_by_aggregate(ctx):
    """ORDER BY ... LIMIT above an aggregate must NOT push a topn/limit
    prune into the scan: the aggregate consumes every row (regression —
    the pruner dropped blocks and corrupted counts; reference
    push_down_limit.rs stops at Aggregate boundaries)."""
    import collections
    ctx.sql("create table g (u bigint, w bigint) row_per_block='100'")
    rng = np.random.default_rng(0)
    u = np.sort(rng.integers(0, 5, 1000))  # sorted -> tight block stats
    ctx.insert_block("g", DataBlock(
        ["u", "w"], [Column(Int64, u.astype(np.int64)),
                     Column(Int64, np.ones(1000, np.int64))]))
    want = sorted(collections.Counter(u.tolist()).items())[:2]
    for dev in (0, 1):
        ctx.sql(f"set enable_device_local_execution = {dev}")
        got = ctx.sql("select u, count(*) from g group by u"
                      " order by u limit 2").rows()
        assert [tuple(x) for x in got] == want, (dev, got, want)
        got = ctx.sql("select u, count(*) from g group by u limit 10").rows()
        assert sorted(got) == sorted(
            collections.Counter(u.tolist()).items()), (dev, got)


def test_merged_group_entries_same_slot(ctx):
    """Multiple GROUP BY keys that are functions of ONE column merge
    into a single tuple-coded grid entry (the grid is the number of
    distinct tuples, not the product of domains)."""
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, upper(k) as u, concat(k, '!') as c2, count(*), sum(p)
        from t group by k, u, c2 order by k""")
    _assert_same(host, dev)
    host, dev = _both(ctx, """
        select upper(k) as u, length(k) as lk, count(x)
        from t where q < 30 group by u, lk order by u, lk""")
    _assert_same(host, dev)


def test_group_domain_restricted_by_predicate(ctx):
    """An equality/IN-style conjunct on a group key restricts the grid
    to the surviving codes (GROUP BY high-card key + in_set filter has
    |in_set| groups, not |dictionary|) — the restricted entry must
    still decode values and NULL slots correctly."""
    _mkdata(ctx)
    ctx.sql("set device_scan_agg_max_groups = 2")
    ctx.sql("set device_scan_agg_max_groups_matmul = 2")
    ctx.sql("set device_scan_agg_max_groups_sort = 100")  # tiny cap
    # q has ~50 distinct values; the filter keeps 3 -> grid must fit
    # the 100-cap only through the restriction
    host, dev = _both(ctx, """
        select q, count(*), sum(p) from t
        where q in (3, 7, 11) group by q order by q""")
    _assert_same(host, dev)
    # d's restricted domain (~1.3k days) still needs the sort engine
    ctx.sql("set device_scan_agg_max_groups_sort = 6000")
    host, dev = _both(ctx, """
        select q, d, count(*) from t
        where q = 5 and d < to_date('2001-01-01')
        group by q, d order by q, d""")
    _assert_same(host, dev)
