"""Extended CREATE TASK grammar, LATERAL derived tables, INTERVAL string
literals.

Reference: task_support CREATE TASK (WAREHOUSE/SCHEDULE/CRON/AFTER/WHEN/
SUSPEND_TASK_AFTER_NUM_FAILURES), lateral derived tables in the binder,
interval literal forms.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_create_task_full_options(ctx):
    ctx.sql("CREATE TABLE t (k INT)")
    ctx.sql("CREATE TASK t1 WAREHOUSE = 'wh' SCHEDULE = 1 MINUTE"
            " SUSPEND_TASK_AFTER_NUM_FAILURES = 3 COMMENT = 'c'"
            " AS INSERT INTO t VALUES (1)")
    ctx.sql("CREATE TASK t2 SCHEDULE = USING CRON '*/5 * * * *' AS SELECT 1")
    ctx.sql("CREATE TASK t3 AFTER t1 WHEN 1 = 1 AS SELECT 2")
    rows = ctx.sql("SHOW TASKS").rows()
    assert len(rows) == 3
    by_name = {r[0]: r for r in rows}
    assert by_name["t1"][2] == "60"
    assert by_name["t2"][2] == "300"  # */5 cron -> 300s beat
    ctx.sql("EXECUTE TASK t1")
    assert ctx.sql("SELECT * FROM t").rows() == [(1,)]


def test_create_or_replace_task(ctx):
    ctx.sql("CREATE TASK rt SCHEDULE = 5 SECOND AS SELECT 1")
    ctx.sql("CREATE OR REPLACE TASK rt SCHEDULE = 10 SECOND AS SELECT 2")
    rows = ctx.sql("SHOW TASKS").rows()
    assert [r for r in rows if r[0] == "rt"][0][2] == "10"


def test_lateral_projection(ctx):
    ctx.sql("CREATE TABLE t (k INT, v INT)")
    ctx.sql("INSERT INTO t VALUES (1,10),(2,20)")
    rows = ctx.sql("SELECT t.k, x.n FROM t, LATERAL (SELECT t.v + 1 AS n) x"
                   " ORDER BY k").rows()
    assert rows == [(1, 11), (2, 21)]
    rows = ctx.sql("SELECT k, x.a, x.b FROM t,"
                   " LATERAL (SELECT v * 2 AS a, v + k AS b) x"
                   " ORDER BY k").rows()
    assert rows == [(1, 20, 11), (2, 40, 22)]


def test_interval_string_literal(ctx):
    import datetime
    assert ctx.sql("SELECT CAST('2024-01-01' AS DATE) + INTERVAL '1 day'"
                   ).rows() == [(datetime.date(2024, 1, 2),)]
    assert ctx.sql("SELECT CAST('2024-01-01' AS DATE) + INTERVAL '3 months'"
                   ).rows() == [(datetime.date(2024, 4, 1),)]
    assert ctx.sql("SELECT CAST('2024-01-10' AS DATE) - INTERVAL '2 days'"
                   ).rows() == [(datetime.date(2024, 1, 8),)]
