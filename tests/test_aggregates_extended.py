"""Extended aggregate functions (reference: src/query/functions/src/aggregates/)."""

import json

import numpy as np
import pytest


@pytest.fixture
def agg_ctx(tmp_catalog, rng):
    c = tmp_catalog
    c.sql("CREATE TABLE ax (g BIGINT, x DOUBLE, y DOUBLE, s VARCHAR, b BOOLEAN)")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Boolean, String
    n = 400
    g = (np.arange(n) % 4).astype(np.int64)
    x = rng.standard_normal(n)
    y = 2.0 * x + 0.1 * rng.standard_normal(n)
    s = [f"s{i % 5}" for i in range(n)]
    b = (np.arange(n) % 3 == 0)
    c.insert_block("ax", DataBlock(
        ["g", "x", "y", "s", "b"],
        [Column.from_numpy(g), Column.from_numpy(x), Column.from_numpy(y),
         Column.from_pylist(s, String), Column.from_numpy(b)]))
    return c, g, x, y, b


def test_covar_and_corr(agg_ctx):
    c, g, x, y, b = agg_ctx
    rows = c.sql("SELECT g, covar_pop(x, y), covar_samp(x, y), corr(x, y)"
                 " FROM ax GROUP BY g ORDER BY g").rows()
    for gi, cp, cs, cr in rows:
        mask = g == gi
        xm, ym = x[mask], y[mask]
        assert cp == pytest.approx(np.cov(xm, ym, bias=True)[0, 1], rel=1e-9)
        assert cs == pytest.approx(np.cov(xm, ym, bias=False)[0, 1], rel=1e-9)
        assert cr == pytest.approx(np.corrcoef(xm, ym)[0, 1], rel=1e-9)


def test_skewness_kurtosis(agg_ctx):
    c, g, x, y, b = agg_ctx
    from scipy import stats as _unused  # noqa: F401  (guard: skip if absent)
    rows = c.sql("SELECT skewness(x), kurtosis(x) FROM ax").rows()
    import scipy.stats
    assert rows[0][0] == pytest.approx(scipy.stats.skew(x), rel=1e-6)
    assert rows[0][1] == pytest.approx(scipy.stats.kurtosis(x), rel=1e-6)


def test_arg_min_max(agg_ctx):
    c, g, x, y, b = agg_ctx
    rows = c.sql("SELECT g, arg_min(s, x), arg_max(s, x) FROM ax"
                 " GROUP BY g ORDER BY g").rows()
    for gi, lo, hi in rows:
        mask = np.nonzero(g == gi)[0]
        assert lo == f"s{mask[np.argmin(x[mask])] % 5}"
        assert hi == f"s{mask[np.argmax(x[mask])] % 5}"


def test_if_combinators(agg_ctx):
    c, g, x, y, b = agg_ctx
    rows = c.sql("SELECT count_if(b), sum_if(x, b), avg_if(x, b),"
                 " min_if(x, b), max_if(x, b) FROM ax").rows()
    xb = x[b]
    assert rows[0][0] == int(b.sum())
    assert rows[0][1] == pytest.approx(xb.sum(), rel=1e-9)
    assert rows[0][2] == pytest.approx(xb.mean(), rel=1e-9)
    assert rows[0][3] == pytest.approx(xb.min(), rel=1e-9)
    assert rows[0][4] == pytest.approx(xb.max(), rel=1e-9)


def test_bool_and_or(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE bt (g BIGINT, v BOOLEAN)")
    c.sql("INSERT INTO bt VALUES (1, true), (1, true), (2, true), (2, false)")
    rows = c.sql("SELECT g, bool_and(v), bool_or(v) FROM bt GROUP BY g"
                 " ORDER BY g").rows()
    assert [tuple(r) for r in rows] == [(1, True, True), (2, False, True)]


def test_group_bit_aggs(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE bits (v BIGINT)")
    c.sql("INSERT INTO bits VALUES (3), (5), (9)")
    r = c.sql("SELECT group_bit_and(v), group_bit_or(v), group_bit_xor(v)"
              " FROM bits").rows()[0]
    assert tuple(r) == (3 & 5 & 9, 3 | 5 | 9, 3 ^ 5 ^ 9)


def test_histogram(agg_ctx):
    c, g, x, y, b = agg_ctx
    r = c.sql("SELECT histogram(x) FROM ax").rows()[0][0]
    buckets = json.loads(r)
    assert len(buckets) == 8
    assert sum(bk["count"] for bk in buckets) == len(x)
    assert buckets[0]["lower"] == pytest.approx(x.min())
    assert buckets[-1]["upper"] == pytest.approx(x.max())


def test_retention(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ev (uid BIGINT, day BIGINT)")
    c.sql("INSERT INTO ev VALUES (1, 0), (1, 1), (1, 2), (2, 0), (2, 2), (3, 1)")
    rows = c.sql("SELECT uid, retention(day = 0, day = 1, day = 2) FROM ev"
                 " GROUP BY uid ORDER BY uid").rows()
    # user 1: hit all days; user 2: day0 + day2; user 3: no day0 -> all 0
    assert rows[0][1] == [1, 1, 1]
    assert rows[1][1] == [1, 0, 1]
    assert rows[2][1] == [0, 0, 0]


def test_new_aggs_survive_spill(agg_ctx):
    """Multi-arg aggregates through the grace spill path."""
    c, g, x, y, b = agg_ctx
    q = ("SELECT g, corr(x, y), arg_max(s, x), count_if(b) FROM ax"
         " GROUP BY g ORDER BY g")
    expected = c.sql(q).rows()
    c.sql("SET aggregate_spill_row_threshold = 50")
    got = c.sql(q).rows()
    assert len(got) == len(expected)
    for a, e in zip(got, expected):
        assert a[0] == e[0] and a[2] == e[2] and a[3] == e[3]
        assert a[1] == pytest.approx(e[1], rel=1e-9)


def test_distinct_aggregates(tmp_path):
    """agg(DISTINCT x) via the DISTINCT combinator (reference
    aggregate_combinator_distinct.rs); was silently ignored before."""
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "da"))
    ctx.sql("CREATE TABLE t (g VARCHAR, v INT)")
    ctx.sql("INSERT INTO t VALUES ('a',1),('a',2),('b',3),('b',3)")
    assert ctx.sql("SELECT g, sum(DISTINCT v) FROM t GROUP BY g"
                   " ORDER BY g").rows() == [("a", 3), ("b", 3)]
    assert ctx.sql("SELECT avg(DISTINCT v) FROM t").rows() == [(2.0,)]
    assert ctx.sql("SELECT count(DISTINCT v) FROM t").rows() == [(3,)]
    # min/max DISTINCT == plain min/max
    assert ctx.sql("SELECT max(DISTINCT v) FROM t").rows() == [(3,)]


def test_group_by_all(tmp_path):
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "ga"))
    ctx.sql("CREATE TABLE t (g VARCHAR, h INT, v INT)")
    ctx.sql("INSERT INTO t VALUES ('a',1,1),('a',1,2),('b',2,3)")
    rows = ctx.sql("SELECT g, h, sum(v) FROM t GROUP BY ALL"
                   " ORDER BY g").rows()
    assert rows == [("a", 1, 3), ("b", 2, 3)]
    import pytest
    with pytest.raises(Exception):
        ctx.sql("SELECT sum(v) FROM t GROUP BY ALL")  # no non-agg items


def test_string_agg_separator_and_distinct(tmp_path):
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "sa"))
    ctx.sql("CREATE TABLE t (g VARCHAR)")
    ctx.sql("INSERT INTO t VALUES ('a'),('a'),('b')")
    assert ctx.sql("SELECT string_agg(g, '|') FROM t").rows() == [("a|a|b",)]
    assert ctx.sql("SELECT string_agg(DISTINCT g, '+') FROM t").rows() \
        == [("a+b",)]
    assert ctx.sql("SELECT group_concat(g) FROM t").rows() == [("a,a,b",)]
