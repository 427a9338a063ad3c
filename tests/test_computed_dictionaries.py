"""Computed columns (STORED/VIRTUAL) and dictionaries (dict_get).

Reference: EE computed_column, CREATE DICTIONARY interpreters +
dict_get async function.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_stored_computed_column(ctx):
    ctx.sql("CREATE TABLE t (a INT, b INT, total INT AS (a + b) STORED)")
    ctx.sql("INSERT INTO t VALUES (1, 2), (10, 20)")
    rows = ctx.sql("SELECT a, b, total FROM t ORDER BY a").rows()
    assert rows == [(1, 2, 3), (10, 20, 30)]
    # computed columns cannot be inserted explicitly
    with pytest.raises(Exception):
        ctx.sql("INSERT INTO t (a, b, total) VALUES (1, 2, 99)")
    # stored values participate in predicates and aggregates
    assert ctx.sql("SELECT sum(total) FROM t WHERE total > 5").rows() == [(30,)]


def test_virtual_computed_column(ctx):
    ctx.sql("CREATE TABLE v (s VARCHAR, up VARCHAR AS (upper(s)) VIRTUAL)")
    ctx.sql("INSERT INTO v VALUES ('ab'), ('cd')")
    rows = ctx.sql("SELECT s, up FROM v ORDER BY s").rows()
    assert rows == [("ab", "AB"), ("cd", "CD")]
    assert ctx.sql("SELECT count(*) FROM v WHERE up = 'AB'").rows() == [(1,)]


def test_computed_insert_select(ctx):
    ctx.sql("CREATE TABLE c2 (a INT, dbl INT AS (a * 2) STORED)")
    ctx.sql("INSERT INTO c2 SELECT number FROM numbers(3)")
    assert [r for r in ctx.sql("SELECT a, dbl FROM c2 ORDER BY a").rows()] \
        == [(0, 0), (1, 2), (2, 4)]


def test_dictionary_crud_and_get(ctx):
    ctx.sql("CREATE TABLE countries (code VARCHAR, cname VARCHAR, pop BIGINT)")
    ctx.sql("INSERT INTO countries VALUES ('de','Germany',83), ('fr','France',68)")
    ctx.sql("CREATE DICTIONARY cdict (code VARCHAR, cname VARCHAR, pop BIGINT)"
            " PRIMARY KEY code SOURCE(TABLE(name='countries'))")
    rows = ctx.sql("SHOW DICTIONARIES").rows()
    assert rows[0][0] == "cdict"
    d = ctx.sql("SHOW CREATE DICTIONARY cdict").to_pydict()
    assert "PRIMARY KEY code" in d["Create Dictionary"][0]
    # dict_get over a table column
    ctx.sql("CREATE TABLE orders (id INT, country VARCHAR)")
    ctx.sql("INSERT INTO orders VALUES (1,'de'), (2,'fr'), (3,'xx')")
    rows = ctx.sql("SELECT id, dict_get(cdict, 'cname', country) FROM orders"
                   " ORDER BY id").rows()
    assert rows == [(1, "Germany"), (2, "France"), (3, None)]
    rows = ctx.sql("SELECT dict_get(cdict, 'pop', 'de')").rows()
    assert rows == [(83,)]
    ctx.sql("DROP DICTIONARY cdict")
    with pytest.raises(Exception):
        ctx.sql("SELECT dict_get(cdict, 'cname', 'de')")


def test_dictionary_mysql_source_unreachable_errors_cleanly(ctx):
    # live MYSQL-source lookups are tested in tests/test_dict_sources.py
    # against this engine's own MySQL front end; an unreachable endpoint
    # must fail the query, not hang
    ctx.sql("CREATE DICTIONARY m (id INT, v VARCHAR) PRIMARY KEY id"
            " SOURCE(MYSQL(host='127.0.0.1', port='9', db='d', table='t'))")
    with pytest.raises(Exception):
        ctx.sql("SELECT dict_get(m, 'v', 1)")


def test_system_dictionaries_and_policies(ctx):
    ctx.sql("CREATE TABLE src0 (k INT, v VARCHAR)")
    ctx.sql("CREATE DICTIONARY sd (k INT, v VARCHAR) PRIMARY KEY k"
            " SOURCE(TABLE(name='src0'))")
    assert ctx.sql("SELECT name FROM system.dictionaries").rows() == [("sd",)]
    ctx.sql("CREATE MASKING POLICY mp AS (v STRING) RETURNS STRING -> '*'")
    assert ctx.sql("SELECT name FROM system.masking_policies").rows() == [("mp",)]
    ctx.sql("CREATE ROW ACCESS POLICY rp AS (v INT) RETURNS BOOLEAN -> v > 0")
    assert ctx.sql("SELECT name FROM system.row_access_policies").rows() == [("rp",)]
