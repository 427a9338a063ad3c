"""SQL scripting: EXECUTE IMMEDIATE $$ ... $$."""

import pytest

from databend_tpu.errors import DatabendError


def run(ctx, body):
    return ctx.sql(f"EXECUTE IMMEDIATE $$\n{body}\n$$")


def test_let_return(tmp_catalog):
    r = run(tmp_catalog, """
        BEGIN
            LET x := 40;
            LET y := :x + 2;
            RETURN :y;
        END
    """)
    assert r.scalar() == 42


def test_if_elseif_else(tmp_catalog):
    body = """
        BEGIN
            LET x := {};
            IF :x > 10 THEN RETURN 'big';
            ELSEIF :x > 5 THEN RETURN 'mid';
            ELSE RETURN 'small';
            END IF;
        END
    """
    assert run(tmp_catalog, body.format(20)).scalar() == "big"
    assert run(tmp_catalog, body.format(7)).scalar() == "mid"
    assert run(tmp_catalog, body.format(1)).scalar() == "small"


def test_while_and_for_range(tmp_catalog):
    r = run(tmp_catalog, """
        BEGIN
            LET total := 0;
            LET i := 0;
            WHILE :i < 5 DO
                i := :i + 1;
                total := :total + :i;
            END WHILE;
            FOR j IN 1 TO 3 DO
                total := :total + :j;
            END FOR;
            RETURN :total;
        END
    """)
    assert r.scalar() == 15 + 6


def test_loop_break_continue(tmp_catalog):
    r = run(tmp_catalog, """
        BEGIN
            LET n := 0;
            LOOP
                n := :n + 1;
                IF :n = 3 THEN CONTINUE; END IF;
                IF :n >= 6 THEN BREAK; END IF;
            END LOOP;
            RETURN :n;
        END
    """)
    assert r.scalar() == 6


def test_script_with_tables_and_resultset(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE sc (v BIGINT)")
    r = run(c, """
        BEGIN
            FOR i IN 1 TO 4 DO
                INSERT INTO sc VALUES (:i);
            END FOR;
            LET rs RESULTSET := SELECT v FROM sc WHERE v > 1 ORDER BY v;
            LET acc := 0;
            FOR row IN rs DO
                acc := :acc + :row.v;
            END FOR;
            RETURN :acc;
        END
    """)
    assert r.scalar() == 9
    assert c.sql("SELECT count(*) FROM sc").scalar() == 4


def test_return_table(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE rt (v BIGINT)")
    c.sql("INSERT INTO rt VALUES (1), (2)")
    r = run(c, "BEGIN RETURN TABLE(SELECT v FROM rt ORDER BY v DESC); END")
    assert [x[0] for x in r.rows()] == [2, 1]


def test_runaway_loop_guard(tmp_catalog):
    with pytest.raises(DatabendError):
        run(tmp_catalog, "BEGIN LOOP LET x := 1; END LOOP; END")
