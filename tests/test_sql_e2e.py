"""End-to-end SQL tests through SessionContext (the bendpy-equivalent API).

The vector/inverted suites mirror the behavior specs in the reference's
sqllogictests (tests/sqllogictests/suites/query/index/09_vector_index,
04_inverted_index).
"""

import numpy as np
import pytest

from databend_tpu.errors import (DatabendError, SemanticError, SyntaxException,
                                 UnknownColumn, UnknownDatabase, UnknownTable)


@pytest.fixture
def ctx(tmp_path):
    from databend_tpu.service.session import SessionContext
    return SessionContext(data_root=str(tmp_path))


def setup_basic(ctx):
    ctx.sql("CREATE TABLE t (id BIGINT, name VARCHAR, price DOUBLE, qty INT)")
    ctx.sql("""INSERT INTO t VALUES
        (1, 'apple', 2.5, 10), (2, 'banana', 1.0, 20),
        (3, 'cherry', 5.0, 5), (4, 'apple', 3.0, NULL),
        (5, NULL, 0.5, 7)""")


class TestBasics:
    def test_select_constant(self, ctx):
        assert ctx.sql("SELECT 1 + 2").scalar() == 3
        assert ctx.sql("SELECT 'x' || 'y'").scalar() == "xy"
        assert ctx.sql("SELECT abs(-4.5)").scalar() == 4.5

    def test_crud_roundtrip(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id, name FROM t ORDER BY id")
        assert r.rows() == [(1, "apple"), (2, "banana"), (3, "cherry"),
                            (4, "apple"), (5, None)]

    def test_where_and_projection(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT name, price * 2 AS p2 FROM t WHERE price > 1.0 ORDER BY p2")
        assert r.rows() == [("apple", 5.0), ("apple", 6.0), ("cherry", 10.0)]
        assert r.column_names == ["name", "p2"]

    def test_nulls(self, ctx):
        setup_basic(ctx)
        assert ctx.sql("SELECT count(*) FROM t WHERE qty IS NULL").scalar() == 1
        assert ctx.sql("SELECT id FROM t WHERE name IS NULL").scalar() == 5
        r = ctx.sql("SELECT coalesce(qty, -1) FROM t ORDER BY id")
        assert [x[0] for x in r.rows()] == [10, 20, 5, -1, 7]

    def test_order_by_desc_nulls(self, ctx):
        setup_basic(ctx)
        # reference default is NULLS LAST in both directions
        # (reference query/order.test)
        r = ctx.sql("SELECT qty FROM t ORDER BY qty DESC")
        assert [x[0] for x in r.rows()] == [20, 10, 7, 5, None]
        r = ctx.sql("SELECT qty FROM t ORDER BY qty DESC NULLS FIRST")
        assert [x[0] for x in r.rows()] == [None, 20, 10, 7, 5]
        r = ctx.sql("SELECT qty FROM t ORDER BY qty ASC NULLS FIRST")
        assert [x[0] for x in r.rows()] == [None, 5, 7, 10, 20]

    def test_limit_offset(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id FROM t ORDER BY id LIMIT 2 OFFSET 1")
        assert [x[0] for x in r.rows()] == [2, 3]

    def test_case_and_in(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("""SELECT id, CASE WHEN price >= 3 THEN 'hi' ELSE 'lo' END
                       FROM t WHERE id IN (1, 3, 4) ORDER BY id""")
        assert r.rows() == [(1, "lo"), (3, "hi"), (4, "hi")]


class TestAggregates:
    def test_global_aggs(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT count(*), sum(price), min(qty), max(qty), avg(price) FROM t")
        row = r.rows()[0]
        assert row[0] == 5
        assert row[1] == pytest.approx(12.0)
        assert row[2] == 5 and row[3] == 20
        assert row[4] == pytest.approx(2.4)

    def test_group_by(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("""SELECT name, count(*) AS c, sum(price) AS s FROM t
                       GROUP BY name ORDER BY c DESC, name""")
        rows = r.rows()
        assert rows[0] == ("apple", 2, pytest.approx(5.5))

    def test_having(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("""SELECT name, count(*) c FROM t GROUP BY name
                       HAVING count(*) > 1""")
        assert r.rows() == [("apple", 2)]

    def test_count_distinct(self, ctx):
        setup_basic(ctx)
        assert ctx.sql("SELECT count(DISTINCT name) FROM t").scalar() == 3

    def test_agg_empty_table(self, ctx):
        ctx.sql("CREATE TABLE e (x INT)")
        assert ctx.sql("SELECT count(*) FROM e").scalar() == 0
        # SQL semantics (reference): SUM over zero rows is NULL, not 0
        assert ctx.sql("SELECT sum(x) FROM e").scalar() is None

    def test_group_by_expression(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id % 2 AS par, count(*) FROM t GROUP BY id % 2 ORDER BY par")
        assert r.rows() == [(0, 2), (1, 3)]


class TestJoins:
    def setup_join(self, ctx):
        ctx.sql("CREATE TABLE a (id INT, v VARCHAR)")
        ctx.sql("CREATE TABLE b (id INT, w VARCHAR)")
        ctx.sql("INSERT INTO a VALUES (1, 'a1'), (2, 'a2'), (3, 'a3')")
        ctx.sql("INSERT INTO b VALUES (2, 'b2'), (3, 'b3'), (4, 'b4')")

    def test_inner_join(self, ctx):
        self.setup_join(ctx)
        r = ctx.sql("SELECT a.id, v, w FROM a INNER JOIN b ON a.id = b.id ORDER BY a.id")
        assert r.rows() == [(2, "a2", "b2"), (3, "a3", "b3")]

    def test_left_join(self, ctx):
        self.setup_join(ctx)
        r = ctx.sql("SELECT a.id, w FROM a LEFT JOIN b ON a.id = b.id ORDER BY a.id")
        assert r.rows() == [(1, None), (2, "b2"), (3, "b3")]

    def test_right_and_cross(self, ctx):
        self.setup_join(ctx)
        r = ctx.sql("SELECT b.id, v FROM a RIGHT JOIN b ON a.id = b.id ORDER BY b.id")
        assert r.rows() == [(2, "a2"), (3, "a3"), (4, None)]
        assert len(ctx.sql("SELECT * FROM a CROSS JOIN b")) == 9

    def test_join_using(self, ctx):
        self.setup_join(ctx)
        r = ctx.sql("SELECT v, w FROM a JOIN b USING (id) ORDER BY v")
        assert r.rows() == [("a2", "b2"), ("a3", "b3")]


class TestSubqueriesAndSetOps:
    def test_from_subquery(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT s.p FROM (SELECT price AS p FROM t WHERE id < 3) s ORDER BY p")
        assert [x[0] for x in r.rows()] == [1.0, 2.5]

    def test_cte(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("WITH cheap AS (SELECT * FROM t WHERE price < 2) "
                    "SELECT count(*) FROM cheap")
        assert r.scalar() == 2

    def test_scalar_subquery(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id FROM t WHERE price = (SELECT max(price) FROM t)")
        assert r.scalar() == 3

    def test_in_subquery(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id FROM t WHERE id IN (SELECT id FROM t WHERE price > 2) ORDER BY id")
        assert [x[0] for x in r.rows()] == [1, 3, 4]

    def test_union(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("SELECT id FROM t WHERE id = 1 UNION ALL SELECT id FROM t WHERE id <= 2 ORDER BY id")
        assert [x[0] for x in r.rows()] == [1, 1, 2]
        r = ctx.sql("SELECT name FROM t WHERE name='apple' UNION SELECT name FROM t WHERE name='apple'")
        assert len(r) == 1

    def test_numbers_table_function(self, ctx):
        assert ctx.sql("SELECT sum(number) FROM numbers(10)").scalar() == 45


class TestDDL:
    def test_databases(self, ctx):
        ctx.sql("CREATE DATABASE db2")
        ctx.sql("USE db2")
        ctx.sql("CREATE TABLE x (a INT)")
        ctx.sql("INSERT INTO x VALUES (7)")
        assert ctx.sql("SELECT a FROM x").scalar() == 7
        names = [r[0] for r in ctx.sql("SHOW DATABASES").rows()]
        assert "db2" in names and "default" in names
        with pytest.raises(DatabendError):
            ctx.sql("CREATE DATABASE db2")
        ctx.sql("USE default")
        ctx.sql("DROP DATABASE db2")
        with pytest.raises(UnknownDatabase):
            ctx.sql("USE db2")

    def test_describe_show(self, ctx):
        setup_basic(ctx)
        rows = ctx.sql("DESCRIBE t").rows()
        assert rows[0][0] == "id" and rows[0][1] == "BIGINT"
        assert ctx.sql("SHOW TABLES").rows() == [("t",)]

    def test_rename_truncate_drop(self, ctx):
        setup_basic(ctx)
        ctx.sql("ALTER TABLE t RENAME TO t2")
        assert len(ctx.sql("SELECT * FROM t2")) == 5
        ctx.sql("TRUNCATE TABLE t2")
        assert len(ctx.sql("SELECT * FROM t2")) == 0
        ctx.sql("DROP TABLE t2")
        with pytest.raises(UnknownTable):
            ctx.sql("SELECT * FROM t2")

    def test_create_table_as_select(self, ctx):
        setup_basic(ctx)
        ctx.sql("CREATE TABLE t3 AS SELECT id, price FROM t WHERE price > 1")
        assert len(ctx.sql("SELECT * FROM t3")) == 3

    def test_settings(self, ctx):
        ctx.sql("SET max_threads = 4")
        rows = dict((r[0], r[1]) for r in ctx.sql("SHOW SETTINGS").rows())
        assert rows["max_threads"] == "4"


class TestDML:
    def test_delete(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("DELETE FROM t WHERE price < 2")
        assert r.affected_rows == 2
        assert len(ctx.sql("SELECT * FROM t")) == 3

    def test_update(self, ctx):
        setup_basic(ctx)
        r = ctx.sql("UPDATE t SET price = price * 10, qty = 0 WHERE name = 'apple'")
        assert r.affected_rows == 2
        rows = ctx.sql("SELECT price, qty FROM t WHERE name = 'apple' ORDER BY id").rows()
        assert rows == [(25.0, 0), (30.0, 0)]

    def test_insert_select(self, ctx):
        setup_basic(ctx)
        ctx.sql("CREATE TABLE t2 (id BIGINT, name VARCHAR, price DOUBLE, qty INT)")
        ctx.sql("INSERT INTO t2 SELECT * FROM t WHERE id <= 2")
        assert len(ctx.sql("SELECT * FROM t2")) == 2


class TestErrors:
    def test_errors(self, ctx):
        setup_basic(ctx)
        with pytest.raises(SyntaxException):
            ctx.sql("SELEC 1")
        with pytest.raises(SemanticError, match="doesn't exist"):
            ctx.sql("SELECT nope FROM t")
        with pytest.raises(UnknownTable):
            ctx.sql("SELECT * FROM missing")
        with pytest.raises(DatabendError):
            ctx.sql("SELECT match(name, 'x') FROM t")  # no inverted index


class TestExplain:
    def test_explain_shape(self, ctx):
        setup_basic(ctx)
        text = "\n".join(r[0] for r in ctx.sql(
            "EXPLAIN SELECT name FROM t WHERE price > 1 ORDER BY price LIMIT 2").rows())
        assert "Scan" in text and "Limit" in text and "Sort" in text

    def test_explain_analyze(self, ctx):
        setup_basic(ctx)
        text = "\n".join(r[0] for r in ctx.sql(
            "EXPLAIN ANALYZE SELECT count(*) FROM t").rows())
        assert "executed in" in text


class TestSystemDatabaseListing:
    """SHOW TABLES FROM system + system rows in system.tables
    (reference src/query/storages/system/src/tables_table.rs lists the
    virtual system tables alongside user tables)."""

    def test_show_tables_from_system(self, ctx):
        rows = ctx.sql("SHOW TABLES FROM system").rows()
        names = {r[0] for r in rows}
        assert {"tables", "columns", "settings"} <= names

    def test_system_tables_lists_system_db(self, ctx):
        rows = ctx.sql(
            "select name, engine from system.tables "
            "where database = 'system'").rows()
        names = {r[0] for r in rows}
        assert {"tables", "columns", "settings"} <= names
        assert all(r[1] == "SystemTable" for r in rows)

    def test_show_tables_from_system_like(self, ctx):
        rows = ctx.sql("SHOW TABLES FROM system LIKE 'set%'").rows()
        assert ("settings",) in rows
