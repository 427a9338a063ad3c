"""FLATTEN/UNNEST (const + lateral), generate_series, result_scan,
INTERSECT/EXCEPT ALL, standalone VALUES, multi-table INSERT.

Reference: FLATTEN srf table function, generate_series table function,
result_scan + result cache, set operators with ALL, multi-table insert.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


# ------------------------------------------------------------- flatten
def test_flatten_const_array(ctx):
    rows = ctx.sql("SELECT value, index FROM FLATTEN(input => [10,20,30])"
                   ).rows()
    assert rows == [("10", 0), ("20", 1), ("30", 2)]


def test_flatten_object_and_path(ctx):
    rows = ctx.sql("SELECT key, value FROM"
                   " FLATTEN(input => '{\"a\":1,\"b\":[2,3]}')").rows()
    assert rows == [("a", "1"), ("b", "[2,3]")]
    rows = ctx.sql("SELECT path, value FROM FLATTEN("
                   "input => '{\"a\":{\"b\":[5,6]}}', recursive => true)"
                   ).rows()
    assert rows == [("a", '{"b":[5,6]}'), ("a.b", "[5,6]"),
                    ("a.b[0]", "5"), ("a.b[1]", "6")]


def test_flatten_outer(ctx):
    assert ctx.sql("SELECT value FROM FLATTEN(input => '{\"a\":1}',"
                   " path => 'a', outer => true)").rows() == [(None,)]
    assert ctx.sql("SELECT count(*) FROM FLATTEN(input => '[]')"
                   ).rows() == [(0,)]


def test_lateral_flatten_variant(ctx):
    ctx.sql("CREATE TABLE ev (id INT, tags VARIANT)")
    ctx.sql("""INSERT INTO ev VALUES (1, '["x","y"]'), (2, '["z"]'),"""
            """ (3, '[]')""")
    rows = ctx.sql("SELECT id, f.value FROM ev,"
                   " LATERAL FLATTEN(input => ev.tags) f"
                   " ORDER BY id, f.index").rows()
    assert rows == [(1, '"x"'), (1, '"y"'), (2, '"z"')]
    rows = ctx.sql("SELECT id, f.value FROM ev,"
                   " LATERAL FLATTEN(input => ev.tags, outer => true) f"
                   " ORDER BY id").rows()
    assert rows == [(1, '"x"'), (1, '"y"'), (2, '"z"'), (3, None)]


def test_lateral_unnest_typed_array(ctx):
    ctx.sql("CREATE TABLE ar (id INT, xs ARRAY(INT))")
    ctx.sql("INSERT INTO ar VALUES (1, [1,2]), (2, [7])")
    rows = ctx.sql("SELECT id, u.value FROM ar, LATERAL UNNEST(ar.xs) u"
                   " ORDER BY id, u.value").rows()
    assert rows == [(1, 1), (1, 2), (2, 7)]
    # aggregation downstream of the explode
    rows = ctx.sql("SELECT id, sum(u.value) FROM ar, UNNEST(ar.xs) u"
                   " GROUP BY id ORDER BY id").rows()
    assert rows == [(1, 3), (2, 7)]


# ----------------------------------------------------- generate_series
def test_generate_series(ctx):
    assert ctx.sql("SELECT * FROM generate_series(1, 5)").rows() == \
        [(1,), (2,), (3,), (4,), (5,)]
    assert ctx.sql("SELECT * FROM generate_series(5, 1, -2)").rows() == \
        [(5,), (3,), (1,)]
    assert ctx.sql("SELECT * FROM range(0, 10, 3)").rows() == \
        [(0,), (3,), (6,), (9,)]


# --------------------------------------------------------- result_scan
def test_result_scan(ctx):
    ctx.sql("CREATE TABLE t (k INT)")
    ctx.sql("INSERT INTO t VALUES (1),(2),(3)")
    ctx.sql("SELECT k * 10 AS kk FROM t")
    assert ctx.sql("SELECT sum(kk) FROM result_scan(last_query_id())"
                   ).rows() == [(60,)]
    qid = ctx.sql("SELECT last_query_id()").rows()[0][0]
    assert ctx.sql(f"SELECT count(*) FROM result_scan('{qid}')"
                   ).rows() == [(1,)]


# ------------------------------------------------- set ops + VALUES
def test_intersect_except_all(ctx):
    ctx.sql("CREATE TABLE a (x INT)")
    ctx.sql("INSERT INTO a VALUES (1),(1),(2),(3),(3),(3)")
    ctx.sql("CREATE TABLE b (x INT)")
    ctx.sql("INSERT INTO b VALUES (1),(3),(3),(4)")
    assert ctx.sql("SELECT x FROM a INTERSECT ALL SELECT x FROM b"
                   " ORDER BY x").rows() == [(1,), (3,), (3,)]
    assert ctx.sql("SELECT x FROM a EXCEPT ALL SELECT x FROM b"
                   " ORDER BY x").rows() == [(1,), (2,), (3,)]
    assert ctx.sql("SELECT x FROM a INTERSECT SELECT x FROM b"
                   " ORDER BY x").rows() == [(1,), (3,)]
    assert ctx.sql("SELECT x FROM a EXCEPT SELECT x FROM b"
                   ).rows() == [(2,)]


def test_standalone_values(ctx):
    assert ctx.sql("VALUES (1, 'a'), (2, 'b')").rows() == \
        [(1, "a"), (2, "b")]
    assert ctx.sql("SELECT 9 UNION VALUES (1),(9) ORDER BY 1"
                   ).rows() == [(1,), (9,)]


# -------------------------------------------------- multi-table INSERT
def test_insert_first(ctx):
    ctx.sql("CREATE TABLE src (k INT, v INT)")
    ctx.sql("INSERT INTO src VALUES (1,10),(2,20),(3,30),(4,40)")
    for t in ("small", "big", "other"):
        ctx.sql(f"CREATE TABLE {t} (k INT, v INT)")
    ctx.sql("INSERT FIRST"
            " WHEN v < 25 THEN INTO small"
            " WHEN v < 35 THEN INTO big"
            " ELSE INTO other"
            " SELECT k, v FROM src")
    assert ctx.sql("SELECT * FROM small ORDER BY k").rows() == \
        [(1, 10), (2, 20)]
    assert ctx.sql("SELECT * FROM big ORDER BY k").rows() == [(3, 30)]
    assert ctx.sql("SELECT * FROM other ORDER BY k").rows() == [(4, 40)]


def test_insert_all_with_values(ctx):
    ctx.sql("CREATE TABLE src (k INT, v INT)")
    ctx.sql("INSERT INTO src VALUES (1,10),(2,20),(3,30)")
    ctx.sql("CREATE TABLE d1 (k INT, v INT)")
    ctx.sql("CREATE TABLE d2 (k INT, v INT)")
    # both INTOs under one WHEN clause get that clause's rows
    ctx.sql("INSERT ALL"
            " WHEN v >= 20 THEN INTO d1 VALUES (k, v * 2) INTO d2"
            " SELECT k, v FROM src")
    assert ctx.sql("SELECT * FROM d1 ORDER BY k").rows() == \
        [(2, 40), (3, 60)]
    assert ctx.sql("SELECT * FROM d2 ORDER BY k").rows() == \
        [(2, 20), (3, 30)]


def test_insert_all_unconditional(ctx):
    ctx.sql("CREATE TABLE src (k INT)")
    ctx.sql("INSERT INTO src VALUES (1),(2)")
    ctx.sql("CREATE TABLE u1 (k INT)")
    ctx.sql("CREATE TABLE u2 (k INT)")
    ctx.sql("INSERT ALL INTO u1 INTO u2 SELECT k FROM src")
    assert ctx.sql("SELECT count(*) FROM u1").rows() == [(2,)]
    assert ctx.sql("SELECT count(*) FROM u2").rows() == [(2,)]
