"""Aggregate FILTER clause, ANY/ALL/SOME quantified comparisons,
named WINDOW clause, GROUP BY alias.

Reference: aggregate FILTER desugar, quantified-comparison subquery
rewrite in the optimizer, named-window binding, and group-by alias
resolution in the select binder.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "dr"))
    c.sql("CREATE TABLE t (k INT, v INT)")
    c.sql("INSERT INTO t VALUES (1,10),(2,20),(3,30),(4,40)")
    c.sql("CREATE TABLE s (x INT)")
    c.sql("INSERT INTO s VALUES (20),(30)")
    return c


# ---------------------------------------------------------------- FILTER
def test_filter_clause(ctx):
    rows = ctx.sql("SELECT count(*) FILTER (WHERE k > 1),"
                   " sum(v) FILTER (WHERE k > 2),"
                   " avg(v) FILTER (WHERE k < 4) FROM t").rows()
    assert rows == [(3, 70, 20.0)]


def test_filter_clause_grouped(ctx):
    rows = ctx.sql("SELECT k % 2, count(*) FILTER (WHERE v >= 20) FROM t"
                   " GROUP BY k % 2 ORDER BY 1").rows()
    assert rows == [(0, 2), (1, 1)]


# ------------------------------------------------------------- ANY / ALL
def test_eq_any(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v = ANY (SELECT x FROM s)"
                   " ORDER BY k").rows() == [(2,), (3,)]


def test_ne_all(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v <> ALL (SELECT x FROM s)"
                   " ORDER BY k").rows() == [(1,), (4,)]


def test_lt_any_gt_all(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v < ANY (SELECT x FROM s)"
                   " ORDER BY k").rows() == [(1,), (2,)]
    assert ctx.sql("SELECT k FROM t WHERE v > ALL (SELECT x FROM s)"
                   " ORDER BY k").rows() == [(4,)]


def test_some_is_any(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v >= SOME (SELECT x FROM s)"
                   " ORDER BY k").rows() == [(2,), (3,), (4,)]


def test_eq_all_and_ne_any(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v = ALL"
                   " (SELECT x FROM s WHERE x = 20)").rows() == [(2,)]
    # s holds two distinct values, so every v differs from at least one
    assert ctx.sql("SELECT count(*) FROM t WHERE v <> ANY"
                   " (SELECT x FROM s)").rows() == [(4,)]


def test_any_empty_set_is_false(ctx):
    assert ctx.sql("SELECT k FROM t WHERE v < ANY"
                   " (SELECT x FROM s WHERE x > 99)").rows() == []


# ---------------------------------------------------------- named WINDOW
def test_named_window(ctx):
    rows = ctx.sql("SELECT k, row_number() OVER w, sum(v) OVER w FROM t"
                   " WINDOW w AS (ORDER BY v) ORDER BY k").rows()
    assert rows == [(1, 1, 10), (2, 2, 30), (3, 3, 60), (4, 4, 100)]


def test_named_window_multi_and_qualify(ctx):
    rows = ctx.sql("SELECT k % 2, rank() OVER w1, count(*) OVER w2 FROM t"
                   " WINDOW w1 AS (PARTITION BY k % 2 ORDER BY v DESC),"
                   " w2 AS (PARTITION BY k % 2) ORDER BY 1, 2").rows()
    assert rows == [(0, 1, 2), (0, 2, 2), (1, 1, 2), (1, 2, 2)]
    rows = ctx.sql("SELECT k FROM t"
                   " WINDOW w AS (PARTITION BY k % 2 ORDER BY v DESC)"
                   " QUALIFY row_number() OVER w = 1 ORDER BY k").rows()
    assert rows == [(3,), (4,)]


def test_unknown_window_errors(ctx):
    with pytest.raises(Exception):
        ctx.sql("SELECT row_number() OVER nope FROM t")


# -------------------------------------------------------- GROUP BY alias
def test_group_by_alias(ctx):
    rows = ctx.sql("SELECT k % 2 AS g, sum(v) FROM t GROUP BY g"
                   " ORDER BY g").rows()
    assert rows == [(0, 60), (1, 40)]
