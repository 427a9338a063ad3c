"""MAP(K,V) type + functions, tuple expressions, recursive CTEs.

Reference: map type + scalars/map.rs functions, tuple access, recursive
CTE binding (anchor UNION [ALL] step with fixpoint iteration).
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


# ------------------------------------------------------------------ maps
def test_map_literal_and_access(ctx):
    assert ctx.sql("SELECT {'a': 1, 'b': 2}").rows() == [({"a": 1, "b": 2},)]
    assert ctx.sql("SELECT {'a': 1, 'b': 2}['b']").rows() == [(2,)]
    assert ctx.sql("SELECT map(['x','y'], [1,2])").rows() == \
        [({"x": 1.0, "y": 2.0},)]


def test_map_functions(ctx):
    assert ctx.sql("SELECT map_keys({'a':1,'b':2}),"
                   " map_values({'a':1,'b':2})").rows() == \
        [(["a", "b"], [1, 2])]
    assert ctx.sql("SELECT map_size({'a':1}),"
                   " map_contains_key({'a':1}, 'a'),"
                   " map_contains_key({'a':1}, 'z')").rows() == \
        [(1, True, False)]
    assert ctx.sql("SELECT map_cat({'a':1}, {'b':2}),"
                   " map_delete({'a':1,'b':2}, 'a')").rows() == \
        [({"a": 1, "b": 2}, {"b": 2})]
    assert ctx.sql("SELECT map_insert({'a':1}, 'b', 9),"
                   " map_pick({'a':1,'b':2,'c':3}, ['a','c'])").rows() == \
        [({"a": 1, "b": 9}, {"a": 1, "c": 3})]


def test_map_column(ctx):
    ctx.sql("CREATE TABLE mt (m MAP(STRING, INT))")
    ctx.sql("INSERT INTO mt VALUES ({'k': 5}), ({'k': 7})")
    assert ctx.sql("SELECT m['k'], map_size(m) FROM mt").rows() == \
        [(5, 1), (7, 1)]


# ---------------------------------------------------------------- tuples
def test_tuple_literal_and_access(ctx):
    assert ctx.sql("SELECT (1, 'x')").rows() == [((1, "x"),)]
    assert ctx.sql("SELECT (1, 'x')[2], (5, 6)[1]").rows() == [("x", 5)]


# -------------------------------------------------------- recursive CTEs
def test_recursive_counter(ctx):
    rows = ctx.sql("WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL"
                   " SELECT n+1 FROM r WHERE n < 5)"
                   " SELECT * FROM r ORDER BY n").rows()
    assert rows == [(1,), (2,), (3,), (4,), (5,)]


def test_recursive_fibonacci(ctx):
    rows = ctx.sql("WITH RECURSIVE f AS (SELECT 0 AS a, 1 AS b UNION ALL"
                   " SELECT b, a+b FROM f WHERE b < 50)"
                   " SELECT a FROM f ORDER BY a").rows()
    assert [r[0] for r in rows] == [0, 1, 1, 2, 3, 5, 8, 13, 21, 34]


def test_recursive_graph_with_cycle(ctx):
    ctx.sql("CREATE TABLE e (src INT, dst INT)")
    ctx.sql("INSERT INTO e VALUES (1,2),(2,3),(3,1),(3,4)")
    # UNION (distinct) terminates despite the 1->2->3->1 cycle
    rows = ctx.sql("WITH RECURSIVE reach AS (SELECT 1 AS node UNION"
                   " SELECT e.dst FROM e JOIN reach ON e.src = reach.node)"
                   " SELECT node FROM reach ORDER BY node").rows()
    assert rows == [(1,), (2,), (3,), (4,)]


def test_recursive_depth_guard(ctx):
    ctx.sql("SET max_cte_recursive_depth = 10")
    with pytest.raises(Exception):
        ctx.sql("WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL"
                " SELECT n+1 FROM r) SELECT count(*) FROM r")


def test_non_recursive_cte_still_works(ctx):
    rows = ctx.sql("WITH c AS (SELECT 2 AS x) SELECT x * 3 FROM c").rows()
    assert rows == [(6,)]
