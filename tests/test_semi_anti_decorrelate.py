"""SEMI/ANTI joins + correlated EXISTS/IN decorrelation.

Reference: hash-join semi/anti kinds + the optimizer's subquery
decorrelation rules (correlated EXISTS/IN -> (anti) semi join).
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "dr"))
    c.sql("CREATE TABLE l (k INT, v INT)")
    c.sql("INSERT INTO l VALUES (1,10),(2,20),(3,30)")
    c.sql("CREATE TABLE r (k INT, w INT)")
    c.sql("INSERT INTO r VALUES (2,1),(3,1),(3,2),(4,1)")
    return c


def test_semi_join(ctx):
    rows = ctx.sql("SELECT k, v FROM l LEFT SEMI JOIN r ON l.k = r.k"
                   " ORDER BY k").rows()
    assert rows == [(2, 20), (3, 30)]  # no duplication from r's two k=3 rows


def test_anti_join(ctx):
    assert ctx.sql("SELECT k FROM l LEFT ANTI JOIN r ON l.k = r.k").rows() \
        == [(1,)]


def test_semi_join_residual(ctx):
    rows = ctx.sql("SELECT l.k FROM l LEFT SEMI JOIN r ON l.k = r.k"
                   " AND r.w > 1 ORDER BY 1").rows()
    assert rows == [(3,)]


def test_correlated_exists(ctx):
    rows = ctx.sql("SELECT k FROM l WHERE EXISTS"
                   " (SELECT 1 FROM r WHERE r.k = l.k) ORDER BY k").rows()
    assert rows == [(2,), (3,)]


def test_correlated_not_exists(ctx):
    rows = ctx.sql("SELECT k FROM l WHERE NOT EXISTS"
                   " (SELECT 1 FROM r WHERE r.k = l.k) ORDER BY k").rows()
    assert rows == [(1,)]


def test_correlated_exists_with_inner_pred(ctx):
    rows = ctx.sql("SELECT k FROM l WHERE EXISTS (SELECT 1 FROM r"
                   " WHERE r.k = l.k AND r.w > 1) ORDER BY k").rows()
    assert rows == [(3,)]


def test_correlated_in(ctx):
    rows = ctx.sql("SELECT k FROM l WHERE v IN"
                   " (SELECT w * 10 FROM r WHERE r.k = l.k)").rows()
    assert rows == []
    ctx.sql("INSERT INTO r VALUES (2, 2)")  # now l(2,20) matches w*10=20
    rows = ctx.sql("SELECT k FROM l WHERE v IN"
                   " (SELECT w * 10 FROM r WHERE r.k = l.k)").rows()
    assert rows == [(2,)]


def test_uncorrelated_still_folds(ctx):
    rows = ctx.sql("SELECT k FROM l WHERE k IN (SELECT k FROM r)"
                   " ORDER BY k").rows()
    assert rows == [(2,), (3,)]
    assert ctx.sql("SELECT count(*) FROM l WHERE EXISTS"
                   " (SELECT 1 FROM r WHERE w > 100)").rows() == [(0,)]


def test_alias_correlation_and_extra_predicates(ctx):
    rows = ctx.sql("SELECT k FROM l a WHERE EXISTS"
                   " (SELECT 1 FROM r WHERE r.k = a.k) AND v > 20"
                   " ORDER BY k").rows()
    assert rows == [(3,)]
