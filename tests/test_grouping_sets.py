"""GROUPING SETS / CUBE / ROLLUP and INTERSECT / EXCEPT.

Reference: grouping-sets binder expansion + set operators.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    c = SessionContext(data_root=str(tmp_path_factory.mktemp("gs")))
    c.sql("CREATE TABLE sales (region VARCHAR, product VARCHAR, amount INT)")
    c.sql("INSERT INTO sales VALUES ('eu','a',1), ('eu','b',2),"
          " ('us','a',3), ('us','b',4)")
    return c


def test_grouping_sets(ctx):
    rows = ctx.sql(
        "SELECT region, product, sum(amount) FROM sales"
        " GROUP BY GROUPING SETS ((region, product), (region), ())"
        " ORDER BY region, product").rows()
    assert rows == [("eu", "a", 1), ("eu", "b", 2), ("eu", None, 3),
                    ("us", "a", 3), ("us", "b", 4), ("us", None, 7),
                    (None, None, 10)]


def test_rollup(ctx):
    rows = ctx.sql("SELECT region, sum(amount) FROM sales"
                   " GROUP BY ROLLUP(region) ORDER BY region").rows()
    assert rows == [("eu", 3), ("us", 7), (None, 10)]


def test_cube_with_grouping_fn(ctx):
    rows = ctx.sql(
        "SELECT region, product, sum(amount), grouping(product) FROM sales"
        " GROUP BY CUBE(region, product) ORDER BY region, product").rows()
    assert ("eu", None, 3, 1) in rows
    assert (None, None, 10, 1) in rows
    assert (None, "a", 4, 0) in rows
    assert len(rows) == 9


def test_grouping_sets_having(ctx):
    rows = ctx.sql(
        "SELECT region, sum(amount) FROM sales"
        " GROUP BY GROUPING SETS ((region), ()) HAVING sum(amount) > 5"
        " ORDER BY region").rows()
    assert rows == [("us", 7), (None, 10)]


def test_intersect(ctx):
    rows = ctx.sql("SELECT region FROM sales INTERSECT SELECT 'eu'").rows()
    assert rows == [("eu",)]


def test_except(ctx):
    rows = ctx.sql("SELECT region FROM sales EXCEPT SELECT 'eu'").rows()
    assert rows == [("us",)]


def test_intersect_multi_column_distinct(ctx):
    rows = ctx.sql(
        "SELECT region, product FROM sales"
        " INTERSECT SELECT region, product FROM sales WHERE amount > 2"
        " ORDER BY region, product").rows()
    assert rows == [("us", "a"), ("us", "b")]


def test_except_empty_result(ctx):
    rows = ctx.sql("SELECT region FROM sales EXCEPT"
                   " SELECT region FROM sales").rows()
    assert rows == []
