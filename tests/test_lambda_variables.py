"""Higher-order array lambdas, session variables, star REPLACE,
COMMENT ON, json_path_*, listagg.

Reference: lambda expressions in the type checker + array lambda kernels
(scalars/array.rs), session variables ($x / getvariable), SELECT *
REPLACE, comment statement, jsonb path query functions.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "dr"))
    c.sql("CREATE TABLE t (k INT, arr ARRAY(INT))")
    c.sql("INSERT INTO t VALUES (1,[1,2]),(10,[3,4,5])")
    return c


# -------------------------------------------------------------- lambdas
def test_array_map_and_closure(ctx):
    assert ctx.sql("SELECT array_map(arr, x -> x * 2) FROM t").rows() == \
        [([2, 4],), ([6, 8, 10],)]
    # closure over an outer column
    assert ctx.sql("SELECT array_map(arr, x -> x + k) FROM t").rows() == \
        [([2, 3],), ([13, 14, 15],)]


def test_array_filter_fold(ctx):
    assert ctx.sql("SELECT array_filter([1,2,3,4], x -> x % 2 = 0)"
                   ).rows() == [([2.0, 4.0],)]
    assert ctx.sql("SELECT array_reduce([1,2,3], 0, (acc, x) -> acc + x)"
                   ).rows() == [(6.0,)]
    assert ctx.sql("SELECT array_fold(arr, 100, (a, x) -> a + x) FROM t"
                   ).rows() == [(103,), (112,)]


def test_array_count_any_all(ctx):
    rows = ctx.sql("SELECT array_count(arr, x -> x > 1),"
                   " array_any(arr, x -> x = 3),"
                   " array_all(arr, x -> x > 0) FROM t").rows()
    assert rows == [(1, False, True), (3, True, True)]


def test_nested_lambda(ctx):
    assert ctx.sql("SELECT array_map([1,2], x ->"
                   " array_count([1,2,3], y -> y <= x))").rows() == \
        [([1, 2],)]


def test_lambda_over_variant(ctx):
    ctx.sql("CREATE TABLE j (v VARIANT)")
    ctx.sql("INSERT INTO j VALUES ('[1,2,3]'), ('[10]')")
    assert ctx.sql("SELECT array_map(v, x -> CAST(x AS INT) * 2) FROM j"
                   ).rows() == [([2, 4, 6],), ([20],)]
    assert ctx.sql("SELECT array_filter(v, x -> CAST(x AS INT) > 1) FROM j"
                   ).rows() == [("[2,3]",), ("[10]",)]


# ------------------------------------------------------------ variables
def test_session_variables(ctx):
    ctx.sql("SET VARIABLE x = 42")
    assert ctx.sql("SELECT $x, getvariable('x'), $x * 2").rows() == \
        [(42, 42, 84)]
    ctx.sql("SET VARIABLE name = 'bob'")
    assert ctx.sql("SELECT $name").rows() == [("bob",)]
    ctx.sql("UNSET VARIABLE x")
    assert ctx.sql("SELECT getvariable('x')").rows() == [(None,)]


# ------------------------------------------------------- star REPLACE
def test_star_replace(ctx):
    ctx.sql("CREATE TABLE r (a INT, b INT)")
    ctx.sql("INSERT INTO r VALUES (1,10),(2,20)")
    assert ctx.sql("SELECT * REPLACE (a + 100 AS a) FROM r ORDER BY b"
                   ).rows() == [(101, 10), (102, 20)]
    assert ctx.sql("SELECT * EXCLUDE b REPLACE (a * 2 AS a) FROM r"
                   " ORDER BY 1").rows() == [(2,), (4,)]


# ---------------------------------------------------------- COMMENT ON
def test_comment_on_table(ctx):
    ctx.sql("COMMENT ON TABLE t IS 'hello world'")
    assert ctx.sql("SELECT comment FROM system.tables WHERE name = 't'"
                   ).rows() == [("hello world",)]


# ------------------------------------------------------------ jsonpath
def test_json_path_functions(ctx):
    assert ctx.sql("""SELECT json_path_query('{"a":[1,2]}', '$.a[*]')"""
                   ).rows() == [("[1,2]",)]
    assert ctx.sql("SELECT json_path_query_first("
                   """'{"a":[{"b":5}]}', '$.a[*].b')""").rows() == [("5",)]
    assert ctx.sql("""SELECT json_path_exists('{"a":1}', '$.a'),"""
                   """ json_path_exists('{"a":1}', '$.z')""").rows() == \
        [(True, False)]


def test_listagg_and_array_flatten(ctx):
    assert ctx.sql("SELECT listagg(CAST(k AS VARCHAR), '-') FROM t"
                   ).rows() == [("1-10",)]
    assert ctx.sql("SELECT array_flatten([[1,2],[3]])").rows() == \
        [("[1.0,2.0,3.0]",)]
