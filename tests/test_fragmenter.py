"""Plan fragmenter: fused Aggregate -> [HAVING] -> Sort(limit) device
fragment vs the host path, on the 8-device virtual CPU mesh.

The fragment compiles the whole multi-exchange region into one XLA
program (parallel/fragmenter.py; reference fragmenter.rs:59,209-266) —
these tests assert end-to-end SQL parity for every sort-key kind, nulls,
HAVING, and the high-cardinality shuffle variant.
"""

import numpy as np
import pytest

from databend_tpu.expression import Column, DataBlock


@pytest.fixture
def ctx(tmp_path):
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    rng = np.random.default_rng(7)
    n = 20_000
    v = rng.random(n)
    v_null = np.where(rng.random(n) < 0.3, None, v)
    c.sql("CREATE TABLE f (grp BIGINT, v DOUBLE, vn DOUBLE NULL)")
    c.insert_block("f", DataBlock(
        ["grp", "v", "vn"],
        [Column.from_numpy(rng.integers(0, 300, n)),
         Column.from_numpy(v),
         Column.from_pylist(list(v_null),
                            c.catalog.get_table("default", "f")
                            .schema.field("vn").dtype)]))
    return c


def _both(c, sql):
    c.sql("SET enable_distributed_execution = 0")
    host = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 1")
    dist = c.sql(sql).rows()
    c.sql("SET enable_distributed_execution = 0")
    return host, dist


def _check(host, dist, approx_cols=()):
    assert len(host) == len(dist)
    for h, d in zip(host, dist):
        for j, (hv, dv) in enumerate(zip(h, d)):
            if j in approx_cols:
                assert dv == pytest.approx(hv, rel=1e-4, abs=1e-6), (h, d)
            else:
                assert dv == hv, (h, d)


@pytest.mark.parametrize("agg,order", [
    ("count(*)", "DESC"),
    ("count(*)", "ASC"),
    ("sum(v)", "DESC"),
    ("min(v)", "ASC"),
    ("max(v)", "DESC"),
    ("avg(v)", "DESC"),
])
def test_fused_agg_topn_keys(ctx, agg, order):
    host, dist = _both(
        ctx, f"SELECT grp, {agg} a FROM f GROUP BY grp"
             f" ORDER BY a {order} LIMIT 7")
    # ties on the key could reorder rows: compare the key column and the
    # group membership set
    assert [round(float(r[1]), 4) for r in host] == \
        [round(float(r[1]), 4) for r in dist]
    if len({r[1] for r in host}) == len(host):  # tie-free: exact rows
        _check(host, dist, approx_cols=(1,))


def test_fused_with_other_outputs(ctx):
    host, dist = _both(
        ctx, "SELECT grp, count(*) c, sum(v) s, avg(v) m FROM f"
             " GROUP BY grp ORDER BY c DESC LIMIT 5")
    assert [r[0] for r in host] == [r[0] for r in dist]
    _check(host, dist, approx_cols=(2, 3))


def test_fused_nullable_aggs(ctx):
    # sum/min/max/avg over a nullable column; groups keep exact parity
    host, dist = _both(
        ctx, "SELECT grp, sum(vn) s, count(vn) c FROM f GROUP BY grp"
             " ORDER BY s DESC LIMIT 6")
    assert [r[0] for r in host] == [r[0] for r in dist]
    _check(host, dist, approx_cols=(1,))


def test_fused_all_null_group_is_null(tmp_path):
    # SUM/MIN/MAX over an all-NULL group must be NULL on the device path
    # too (the hidden non-null-count column)
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    c.sql("CREATE TABLE g (k BIGINT, x DOUBLE NULL)")
    c.sql("INSERT INTO g VALUES (1, 10.0), (1, 5.0), (2, NULL), (2, NULL),"
          " (3, 1.0)")
    host, dist = _both(
        c, "SELECT k, sum(x) s, min(x), max(x), avg(x) FROM g GROUP BY k"
           " ORDER BY s DESC NULLS LAST LIMIT 10")
    _check(host, dist, approx_cols=(1, 2, 3, 4))
    assert dist[-1][1] is None  # the all-NULL group sorts last and is NULL


def test_fused_having(ctx):
    host, dist = _both(
        ctx, "SELECT grp, count(*) c FROM f GROUP BY grp"
             " HAVING count(*) > 60 ORDER BY c DESC LIMIT 5")
    assert [r[0] for r in host] == [r[0] for r in dist]
    _check(host, dist)
    host2, dist2 = _both(
        ctx, "SELECT grp, count(*) c, avg(v) m FROM f GROUP BY grp"
             " HAVING count(*) > 50 AND avg(v) < 0.6"
             " ORDER BY m ASC LIMIT 4")
    assert [r[0] for r in host2] == [r[0] for r in dist2]


def test_fused_having_filters_everything(ctx):
    host, dist = _both(
        ctx, "SELECT grp, count(*) c FROM f GROUP BY grp"
             " HAVING count(*) > 1000000 ORDER BY c DESC LIMIT 5")
    assert host == dist == []


def test_fused_high_cardinality_shuffle(tmp_path):
    # > 65536 groups routes through the fused shuffle program; only the
    # winners ever come back to the host
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    rng = np.random.default_rng(3)
    n = 200_000
    c.sql("CREATE TABLE h (k BIGINT, v DOUBLE)")
    c.insert_block("h", DataBlock(
        ["k", "v"],
        [Column.from_numpy(rng.integers(0, 100_000, n)),
         Column.from_numpy(rng.random(n))]))
    host, dist = _both(
        c, "SELECT k, count(*) c, sum(v) s FROM h GROUP BY k"
           " ORDER BY s DESC LIMIT 10")
    assert [r[0] for r in host] == [r[0] for r in dist]
    _check(host, dist, approx_cols=(2,))


def test_fused_path_actually_runs(ctx, monkeypatch):
    # guard against silent fallback: the distributed run must go through
    # the fused device program
    from databend_tpu.parallel import fragmenter
    calls = []
    orig = fragmenter.sharded_grouped_agg_topn

    def spy(*a, **k):
        calls.append(a[3])
        return orig(*a, **k)

    monkeypatch.setattr(fragmenter, "sharded_grouped_agg_topn", spy)
    ctx.sql("SET enable_distributed_execution = 1")
    ctx.sql("SELECT grp, count(*) c FROM f GROUP BY grp"
            " ORDER BY c DESC LIMIT 3").rows()
    ctx.sql("SET enable_distributed_execution = 0")
    assert calls == [300]


def test_fragment_matching_is_static():
    # the matcher sees through rename projections and rejects what the
    # device program cannot run
    from databend_tpu.parallel import fragmenter
    from databend_tpu.sql.plans import SortPlan, SortItem

    class _Dummy:  # not a ProjectPlan/AggregatePlan
        pass

    p = SortPlan(child=_Dummy(), items=[SortItem("x")], limit=5,
                 distributed=True)
    assert fragmenter.match_agg_topn(p) is None
    p2 = SortPlan(child=_Dummy(), items=[SortItem("x")], limit=None,
                  distributed=True)
    assert fragmenter.match_agg_topn(p2) is None
