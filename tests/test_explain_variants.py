"""EXPLAIN AST/RAW/PIPELINE, SHOW PROCESSLIST, CREATE CONNECTION.

Reference: ExplainKind (Syntax/Raw/Pipeline/Plan/Analyze), connection
management (src/meta/app-storage).
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "dr"))
    c.sql("CREATE TABLE t (v INT)")
    c.sql("INSERT INTO t VALUES (1), (2)")
    return c


def test_explain_ast(ctx):
    lines = [r[0] for r in ctx.sql("EXPLAIN AST SELECT v FROM t WHERE v > 0").rows()]
    assert lines[0] == "QueryStmt"
    assert any("SelectStmt" in ln for ln in lines)
    assert any("ColumnRef" in ln for ln in lines)


def test_explain_pipeline(ctx):
    lines = [r[0] for r in ctx.sql("EXPLAIN PIPELINE SELECT v FROM t").rows()]
    assert any("_exec_scan" in ln for ln in lines)


def test_explain_raw_vs_plan(ctx):
    raw = ctx.sql("EXPLAIN RAW SELECT v FROM t WHERE v > 0").rows()
    plan = ctx.sql("EXPLAIN SELECT v FROM t WHERE v > 0").rows()
    assert raw and plan


def test_connections_crud(ctx):
    ctx.sql("CREATE CONNECTION c1 STORAGE_TYPE='s3' ACCESS_KEY_ID='AK'"
            " SECRET_ACCESS_KEY='SK'")
    rows = ctx.sql("SHOW CONNECTIONS").rows()
    assert rows[0][0] == "c1"
    # secrets are redacted everywhere
    assert "SK" not in rows[0][2] and "***" in rows[0][2]
    d = ctx.sql("DESC CONNECTION c1").to_pydict()
    assert "AK" in d["storage_params"][0]
    with pytest.raises(Exception):
        ctx.sql("CREATE CONNECTION c1 STORAGE_TYPE='s3'")
    ctx.sql("CREATE OR REPLACE CONNECTION c1 STORAGE_TYPE='gcs'")
    assert ctx.sql("SHOW CONNECTIONS").rows()[0][1] == "gcs"
    ctx.sql("DROP CONNECTION c1")
    assert ctx.sql("SHOW CONNECTIONS").rows() == []
    ctx.sql("DROP CONNECTION IF EXISTS c1")


def test_show_processlist(ctx):
    rows = ctx.sql("SHOW PROCESSLIST").rows()
    # our own SHOW PROCESSLIST query is registered while running
    assert any("PROCESSLIST" in r[2] for r in rows)
