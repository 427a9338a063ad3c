"""Stored procedures: CREATE PROCEDURE / CALL / DROP + system.procedures.

Reference: procedure interpreters + procedures_table.rs; bodies are the
same script language as EXECUTE IMMEDIATE (src/query/script).
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_procedure_roundtrip(ctx):
    ctx.sql("""CREATE PROCEDURE addtwo(a INT, b INT) AS $$
BEGIN
    RETURN :a + :b;
END
$$""")
    assert ctx.sql("CALL addtwo(3, 4)").rows() == [(7,)]
    assert ctx.sql("SHOW PROCEDURES").rows() == [("addtwo", "a INT, b INT")]
    rows = ctx.sql("SELECT name FROM system.procedures").rows()
    assert rows == [("addtwo",)]
    ctx.sql("DROP PROCEDURE addtwo")
    with pytest.raises(Exception):
        ctx.sql("CALL addtwo(1, 2)")


def test_procedure_with_dml(ctx):
    ctx.sql("CREATE TABLE log_t (msg VARCHAR)")
    ctx.sql("""CREATE PROCEDURE ins(n INT) AS $$
BEGIN
    LET i := 0;
    WHILE :i < :n DO
        INSERT INTO log_t VALUES ('row');
        LET i := :i + 1;
    END WHILE;
    RETURN :i;
END
$$""")
    assert ctx.sql("CALL ins(3)").rows() == [(3,)]
    assert ctx.sql("SELECT count(*) FROM log_t").rows() == [(3,)]


def test_procedure_replace_and_errors(ctx):
    ctx.sql("CREATE PROCEDURE p0() AS $$ BEGIN RETURN 1; END $$")
    with pytest.raises(Exception):
        ctx.sql("CREATE PROCEDURE p0() AS $$ BEGIN RETURN 2; END $$")
    ctx.sql("CREATE OR REPLACE PROCEDURE p0() AS $$ BEGIN RETURN 2; END $$")
    assert ctx.sql("CALL p0()").rows() == [(2,)]
    with pytest.raises(Exception):
        ctx.sql("CALL p0(1)")  # arity
    ctx.sql("DROP PROCEDURE IF EXISTS nope")
