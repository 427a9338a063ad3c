import pytest

from databend_tpu.errors import SyntaxException
from databend_tpu.sql import parse_sql
from databend_tpu.sql import ast as A
from databend_tpu.sql.parser import parse_statements


def q(sql):
    stmt = parse_sql(sql)
    assert isinstance(stmt, A.QueryStmt)
    return stmt.query


class TestQueries:
    def test_simple_select(self):
        query = q("SELECT a, b FROM t")
        sel = query.body
        assert [i.expr.name for i in sel.items] == ["a", "b"]
        assert sel.from_.name == "t"

    def test_star_and_alias(self):
        query = q("select *, a+1 AS a1, t.* from db1.t t")
        sel = query.body
        assert isinstance(sel.items[0].expr, A.Star)
        assert sel.items[1].alias == "a1"
        assert sel.items[2].expr.table == "t"
        assert sel.from_.database == "db1" and sel.from_.alias == "t"

    def test_where_precedence(self):
        query = q("SELECT a FROM t WHERE a + 1 * 2 > 3 AND b = 'x' OR NOT c")
        w = query.body.where
        assert isinstance(w, A.BinaryOp) and w.op == "OR"
        assert w.left.op == "AND"
        assert w.left.left.op == ">"
        assert w.left.left.left.op == "+"
        assert w.left.left.left.right.op == "*"

    def test_order_limit(self):
        query = q("SELECT a FROM t ORDER BY a DESC, b ASC NULLS FIRST LIMIT 5 OFFSET 2")
        assert not query.order_by[0].asc
        assert query.order_by[1].nulls_first is True
        assert query.limit.value == 5 and query.offset.value == 2

    def test_knn_query(self):
        query = q("SELECT id FROM t ORDER BY cosine_distance(emb, [0.1, 0.2]) ASC LIMIT 10")
        ob = query.order_by[0].expr
        assert isinstance(ob, A.FunctionCall) and ob.name == "cosine_distance"
        assert ob.args[1].value == [0.1, 0.2]

    def test_group_having(self):
        query = q("SELECT k, count(*) FROM t GROUP BY k HAVING count(*) > 2")
        sel = query.body
        assert len(sel.group_by) == 1 and sel.having.op == ">"
        assert sel.items[1].expr.name == "count"

    def test_joins(self):
        query = q("SELECT * FROM a INNER JOIN b ON a.x = b.x LEFT JOIN c USING (y)")
        j = query.body.from_
        assert isinstance(j, A.Join) and j.kind == "LEFT" and j.using == ["y"]
        assert j.left.kind == "INNER"

    def test_subquery_cte_union(self):
        query = q("WITH m AS (SELECT 1 a) SELECT * FROM (SELECT a FROM m) s UNION ALL SELECT 2")
        assert query.ctes[0][0] == "m"
        assert isinstance(query.body, A.SetOp) and query.body.op == "UNION ALL"

    def test_case_cast_between_in(self):
        query = q("""SELECT CASE WHEN a > 1 THEN 'big' ELSE 'small' END,
                     CAST(a AS DOUBLE), a::INT, b BETWEEN 1 AND 2,
                     c IN (1,2,3), d NOT IN (4), e IS NOT NULL FROM t""")
        items = query.body.items
        assert isinstance(items[0].expr, A.Case)
        assert isinstance(items[1].expr, A.Cast)
        assert isinstance(items[2].expr, A.Cast)
        assert isinstance(items[3].expr, A.Between)
        assert isinstance(items[4].expr, A.InList)
        assert items[5].expr.negated
        assert items[6].expr.negated

    def test_search_functions(self):
        query = q("SELECT id, score() FROM t WHERE match(body, 'hello world')")
        w = query.body.where
        assert w.name == "match" and w.args[1].value == "hello world"

    def test_negative_literal_and_float(self):
        query = q("SELECT -3, -2.5e2, .5")
        vals = [i.expr.value for i in query.body.items]
        assert vals == [-3, -250.0, 0.5]


class TestDDL:
    def test_create_table(self):
        s = parse_sql("""CREATE TABLE IF NOT EXISTS db1.t (
            id BIGINT NOT NULL,
            name VARCHAR NULL DEFAULT 'x',
            emb VECTOR(128),
            tags ARRAY(VARCHAR)
        ) ENGINE = FUSE CLUSTER BY (id) row_per_block='1000'""")
        assert isinstance(s, A.CreateTable)
        assert s.if_not_exists and s.database == "db1"
        assert s.columns[0].type_name == "BIGINT" and not s.columns[0].nullable
        assert s.columns[2].type_name == "VECTOR(128)"
        assert s.columns[3].type_name == "ARRAY(VARCHAR)"
        assert s.options["row_per_block"] == "1000"
        assert len(s.cluster_by) == 1

    def test_create_vector_index(self):
        s = parse_sql("CREATE VECTOR INDEX idx1 ON t(emb) m=16 ef_construct=64 distance='cosine,l2'")
        assert isinstance(s, A.CreateIndex)
        assert s.index_type == "VECTOR" and s.columns == ["emb"]
        assert s.options == {"m": "16", "ef_construct": "64", "distance": "cosine,l2"}

    def test_create_inverted_index(self):
        s = parse_sql("CREATE INVERTED INDEX IF NOT EXISTS i2 ON db.t(body) tokenizer='english'")
        assert s.index_type == "INVERTED" and s.if_not_exists and s.database == "db"

    def test_drop_refresh(self):
        s = parse_sql("DROP TABLE IF EXISTS t ALL")
        assert s.if_exists and s.all_
        s = parse_sql("DROP VECTOR INDEX idx1 ON t")
        assert s.index_type == "VECTOR"
        s = parse_sql("REFRESH VECTOR INDEX idx1 ON t")
        assert isinstance(s, A.RefreshIndex)

    def test_create_table_as_select(self):
        s = parse_sql("CREATE TABLE t2 AS SELECT * FROM t1")
        assert s.as_query is not None and not s.columns


class TestDML:
    def test_insert_values(self):
        s = parse_sql("INSERT INTO t (id, emb) VALUES (1, [1.0, 2.0]), (2, [3.0, 4.0])")
        assert isinstance(s, A.Insert)
        assert s.columns == ["id", "emb"] and len(s.values) == 2
        assert s.values[0][1].value == [1.0, 2.0]

    def test_insert_select(self):
        s = parse_sql("INSERT INTO t SELECT * FROM s")
        assert s.query is not None

    def test_delete_update(self):
        s = parse_sql("DELETE FROM t WHERE id = 3")
        assert isinstance(s, A.Delete) and s.where.op == "="
        s = parse_sql("UPDATE t SET a = 1, b = b + 1 WHERE c")
        assert isinstance(s, A.Update) and len(s.assignments) == 2


class TestMisc:
    def test_show_describe_use_set(self):
        assert parse_sql("SHOW TABLES FROM db1 LIKE 't%'").from_db == "db1"
        assert parse_sql("SHOW DATABASES").what == "DATABASES"
        assert parse_sql("DESCRIBE t").name == "t"
        s = parse_sql("SET max_threads = 8")
        assert s.name == "max_threads" and s.value == 8
        assert parse_sql("USE db2").name == "db2"

    def test_explain(self):
        s = parse_sql("EXPLAIN SELECT 1")
        assert isinstance(s, A.ExplainStmt) and not s.analyze
        s = parse_sql("EXPLAIN ANALYZE SELECT 1")
        assert s.analyze

    def test_multi_statements(self):
        stmts = parse_statements("CREATE DATABASE d; USE d; SELECT 1;")
        assert len(stmts) == 3

    def test_syntax_errors(self):
        for bad in ["SELECT FROM", "CREATE TABEL t (a INT)", "SELECT 1 FROM t WHERE",
                    "INSERT t VALUES (1)", "SELECT * FROM t ORDER LIMIT 1"]:
            with pytest.raises(SyntaxException):
                parse_sql(bad)

    def test_comments(self):
        query = q("SELECT 1 -- trailing\n/* block\ncomment */ + 2")
        assert query.body.items[0].expr.op == "+"

    def test_time_travel(self):
        query = q("SELECT * FROM t AT (SNAPSHOT => 'abc123')")
        assert query.body.from_.at_snapshot == ("snapshot", "abc123")
        query = q("SELECT * FROM t AT (OFFSET => -3600)")
        assert query.body.from_.at_snapshot == ("offset", -3600.0)
        query = q("SELECT * FROM t AT (TIMESTAMP => '2026-01-01T00:00:00+00:00')")
        kind, ts = query.body.from_.at_snapshot
        assert kind == "timestamp" and ts > 1.7e9
