"""Sequences (CREATE SEQUENCE / nextval) and session temp tables.

Reference: interpreter_sequence_*.rs, SequenceMeta (current/start/step),
temp tables in session state.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_sequence_crud(ctx):
    ctx.sql("CREATE SEQUENCE seq1")
    ctx.sql("CREATE SEQUENCE IF NOT EXISTS seq1")
    with pytest.raises(Exception):
        ctx.sql("CREATE SEQUENCE seq1")
    d = ctx.sql("DESC SEQUENCE seq1").to_pydict()
    assert d["current"] == ["1"]
    rows = ctx.sql("SHOW SEQUENCES").rows()
    assert rows[0][0] == "seq1"
    ctx.sql("DROP SEQUENCE seq1")
    ctx.sql("DROP SEQUENCE IF EXISTS seq1")
    with pytest.raises(Exception):
        ctx.sql("DROP SEQUENCE seq1")


def test_nextval_scalar_and_blocks(ctx):
    ctx.sql("CREATE SEQUENCE s")
    assert ctx.sql("SELECT nextval(s)").rows() == [(1,)]
    assert ctx.sql("SELECT nextval(s)").rows() == [(2,)]
    # n-row block allocates n consecutive values
    rows = ctx.sql("SELECT nextval(s) FROM (SELECT * FROM numbers(5))").rows()
    assert [r[0] for r in rows] == [3, 4, 5, 6, 7]


def test_nextval_insert_ids(ctx):
    ctx.sql("CREATE SEQUENCE ids START = 100 INCREMENT = 10")
    ctx.sql("CREATE TABLE t (id BIGINT, v VARCHAR)")
    ctx.sql("INSERT INTO t SELECT nextval(ids), 'x' FROM numbers(3)")
    assert [r[0] for r in ctx.sql("SELECT id FROM t ORDER BY id").rows()] \
        == [100, 110, 120]
    d = ctx.sql("DESC SEQUENCE ids").to_pydict()
    assert d["current"] == ["130"]


def test_nextval_unknown_sequence(ctx):
    with pytest.raises(Exception):
        ctx.sql("SELECT nextval(nope)")


def test_system_sequences(ctx):
    ctx.sql("CREATE SEQUENCE metered")
    ctx.sql("SELECT nextval(metered)")
    rows = ctx.sql(
        "SELECT name, current FROM system.sequences WHERE name='metered'").rows()
    assert rows == [("metered", 2)]


def test_temp_table_lifecycle(ctx):
    ctx.sql("CREATE TEMP TABLE tt (id INT, s VARCHAR)")
    ctx.sql("INSERT INTO tt VALUES (1, 'a'), (2, 'b')")
    assert ctx.sql("SELECT count(*) FROM tt").rows() == [(2,)]
    d = ctx.sql("DESCRIBE tt").to_pydict()
    assert d["field"] == ["id", "s"]
    rows = ctx.sql("SELECT database, name, num_rows FROM system.temp_tables").rows()
    assert rows == [("default", "tt", 2)]
    ctx.sql("DROP TABLE tt")
    with pytest.raises(Exception):
        ctx.sql("SELECT * FROM tt")


def test_temp_table_shadows_catalog(ctx):
    ctx.sql("CREATE TABLE dup (v INT)")
    ctx.sql("INSERT INTO dup VALUES (1)")
    ctx.sql("CREATE TEMPORARY TABLE dup (v INT)")
    ctx.sql("INSERT INTO dup VALUES (100)")
    assert ctx.sql("SELECT v FROM dup").rows() == [(100,)]
    ctx.sql("DROP TABLE dup")  # drops the temp shadow first
    assert ctx.sql("SELECT v FROM dup").rows() == [(1,)]


def test_temp_table_session_scoped(ctx, tmp_path):
    ctx.sql("CREATE TEMP TABLE mine (v INT)")
    other = SessionContext(data_root=str(tmp_path / "dr"))
    with pytest.raises(Exception):
        other.sql("SELECT * FROM mine")


def test_temp_table_ctas_and_joins(ctx):
    ctx.sql("CREATE TABLE base (id INT, v INT)")
    ctx.sql("INSERT INTO base VALUES (1, 10), (2, 20)")
    ctx.sql("CREATE TEMP TABLE snap AS SELECT * FROM base WHERE id = 2")
    rows = ctx.sql(
        "SELECT b.id, s.v FROM base b JOIN snap s ON b.id = s.id").rows()
    assert rows == [(2, 20)]


def test_transient_table_option(ctx):
    ctx.sql("CREATE TRANSIENT TABLE tr (v INT)")
    ctx.sql("INSERT INTO tr VALUES (5)")
    assert ctx.sql("SELECT v FROM tr").rows() == [(5,)]
    # registered in the shared catalog (not session temp)
    assert ctx.sql("SELECT count(*) FROM system.temp_tables").rows() == [(0,)]
