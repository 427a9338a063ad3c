"""Device finalize fusion (pipeline/device_fusion.py).

HAVING / ORDER BY ... LIMIT k applied ON the [K, G] aggregate grid in
HBM so only the selected groups ever cross the host<->device link.
These tests force the route (min_rows=0) and assert the fused result is
identical to the host path — including the exact big-int ordering over
base-256 limb sums (no f64 in the comparator). Reference shape:
TransformSortMergeLimit's bounded heap over aggregate output
(src/query/pipeline/transforms/src/processors/transforms/sorts/
sort_merge_limit.rs:33) and pipeline HAVING evaluation."""

import tempfile

import numpy as np
import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import Column, DataBlock
from databend_tpu.types import Float64, Int64, String
from databend_tpu.utils.metrics import METRICS


def _routed():
    s = METRICS.snapshot()
    return (s.get("device_scan_agg_queries", 0)
            + s.get("device_join_agg_queries", 0))


@pytest.fixture()
def ctx():
    c = SessionContext(data_root=tempfile.mkdtemp())
    c.sql("set device_scan_agg_min_rows = 0")
    yield c


def _mkdata(ctx, n=20000, seed=7, groups=500):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, groups, n)
    k = np.array([f"g{int(v):04d}" for v in g])
    q = rng.integers(1, 51, n).astype(float)
    p = (rng.random(n) * 1000 - 300).round(2)   # negatives exercised
    x = rng.integers(0, 100, n).astype(object)
    x[rng.random(n) < 0.1] = None
    ctx.sql("create table t (k string, gi int, q double, p double,"
            " x int null)")
    cols = [Column.from_pylist(list(k), String),
            Column(Int64, g.astype(np.int64)),
            Column(Float64, q), Column(Float64, p),
            Column.from_pylist(list(x), Int64.wrap_nullable())]
    ctx.insert_block("t", DataBlock(["k", "gi", "q", "p", "x"], cols, n))


def _both(ctx, sql, must_route=True):
    ctx.sql("set enable_device_local_execution = 0")
    host = ctx.sql(sql).rows()
    ctx.sql("set enable_device_local_execution = 1")
    before = _routed()
    dev = ctx.sql(sql).rows()
    if must_route:
        # join-enriched routes bump both the scan-agg and join-agg counters
        assert _routed() > before, f"route did not engage for: {sql}"
    return host, dev


def _assert_same(host, dev, ordered=True):
    if not ordered:
        host = sorted(host, key=repr)
        dev = sorted(dev, key=repr)
    assert len(host) == len(dev), (len(host), len(dev))
    for hr, dr in zip(host, dev):
        assert len(hr) == len(dr)
        for a, b in zip(hr, dr):
            if isinstance(a, float) and isinstance(b, float):
                assert b == pytest.approx(a, rel=1e-12, abs=1e-9), (hr, dr)
            else:
                assert a == b, (hr, dr)


def test_topn_sum_desc(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(p) s from t group by k order by s desc limit 10
    """)
    _assert_same(host, dev)


def test_topn_sum_asc_with_ties_broken_by_key(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(q) s, count(*) c from t
        group by k order by c asc, k asc limit 15
    """)
    _assert_same(host, dev)


def test_topn_order_by_group_key(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(p) s from t group by k order by k desc limit 7
    """)
    _assert_same(host, dev)


def test_having_only(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(q) s from t group by k having sum(q) > 1050
    """)
    _assert_same(host, dev, ordered=False)


def test_having_plus_topn(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(p) s, count(*) c from t group by k
        having count(*) >= 30 and sum(q) < 1200
        order by s desc limit 5
    """)
    _assert_same(host, dev)


def test_having_float_threshold_exact(ctx):
    _mkdata(ctx)
    # float constant against a 2-decimal sum: must be exact, not f64-ish
    host, dev = _both(ctx, """
        select k, sum(p) s from t group by k having sum(p) >= 10289.25
        order by k limit 100
    """)
    _assert_same(host, dev)


def test_having_empty_result(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select k, sum(q) s from t group by k having sum(q) > 1e12
    """)
    assert host == [] and dev == []


def test_topn_nullable_sum(ctx):
    _mkdata(ctx)
    host, dev = _both(ctx, """
        select gi, sum(x) sx from t group by gi
        order by sx desc limit 12
    """)
    _assert_same(host, dev)


def test_limit_larger_than_groups(ctx):
    _mkdata(ctx, groups=20)
    host, dev = _both(ctx, """
        select k, count(*) c from t group by k order by c desc, k limit 999
    """)
    _assert_same(host, dev)


def test_multi_key_group_fused(ctx):
    _mkdata(ctx, groups=40)
    host, dev = _both(ctx, """
        select k, gi % 4 m, sum(p) s from t group by k, m
        order by s desc limit 9
    """)
    _assert_same(host, dev)


def test_fused_join_enrichment_topn(ctx):
    _mkdata(ctx, groups=60)
    ctx.sql("create table d (dgi int, region string)")
    gi = np.arange(60, dtype=np.int64)
    reg = np.array([f"r{int(v) % 5}" for v in gi])
    ctx.insert_block("d", DataBlock(
        ["dgi", "region"],
        [Column(Int64, gi), Column.from_pylist(list(reg), String)], 60))
    host, dev = _both(ctx, """
        select region, sum(p) s from t join d on t.gi = d.dgi
        group by region order by s desc limit 3
    """)
    _assert_same(host, dev)
