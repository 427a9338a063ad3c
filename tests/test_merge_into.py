"""MERGE INTO."""

import pytest

from databend_tpu.errors import DatabendError


@pytest.fixture
def ctx(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE tgt (id BIGINT, v BIGINT, tag VARCHAR)")
    c.sql("CREATE TABLE src (id BIGINT, v BIGINT)")
    c.sql("INSERT INTO tgt VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')")
    c.sql("INSERT INTO src VALUES (2, 200), (3, -1), (4, 400)")
    return c


def test_merge_update_delete_insert(ctx):
    r = ctx.sql("""MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN MATCHED AND src.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = src.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)""")
    assert r.affected_rows == 3
    rows = sorted(ctx.sql("SELECT id, v FROM tgt").rows())
    assert rows == [(1, 10), (2, 200), (4, 400)]
    # untouched column survives the rewrite
    assert ctx.sql("SELECT tag FROM tgt WHERE id = 1").scalar() == "a"
    assert ctx.sql("SELECT tag FROM tgt WHERE id = 4").scalar() is None


def test_merge_with_subquery_source_and_expressions(ctx):
    ctx.sql("""MERGE INTO tgt AS t USING (SELECT id, v * 2 AS dv FROM src WHERE v > 0) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.dv + 1""")
    assert ctx.sql("SELECT v FROM tgt WHERE id = 2").scalar() == 401
    # non-matching rows untouched
    assert ctx.sql("SELECT v FROM tgt WHERE id = 1").scalar() == 10


def test_merge_clause_order_wins(ctx):
    ctx.sql("""MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN MATCHED AND tgt.id = 2 THEN UPDATE SET v = 999
        WHEN MATCHED THEN DELETE""")
    rows = sorted(ctx.sql("SELECT id, v FROM tgt").rows())
    assert rows == [(1, 10), (2, 999)]  # id=3 deleted by second clause


def test_merge_requires_equality(ctx):
    with pytest.raises(DatabendError):
        ctx.sql("""MERGE INTO tgt USING src ON tgt.id > src.id
            WHEN MATCHED THEN DELETE""")


def test_merge_insert_only(ctx):
    ctx.sql("""MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)""")
    assert ctx.sql("SELECT count(*) FROM tgt").scalar() == 4
    assert ctx.sql("SELECT v FROM tgt WHERE id = 2").scalar() == 20  # untouched


def test_merge_null_keys_never_match(ctx):
    """ADVICE r1: NULL in an equi-key must leave rows unmatched."""
    ctx.sql("CREATE TABLE mt_null (k BIGINT NULL, v BIGINT)")
    ctx.sql("CREATE TABLE ms_null (k BIGINT NULL, v BIGINT)")
    ctx.sql("INSERT INTO mt_null VALUES (NULL, 1), (2, 2)")
    ctx.sql("INSERT INTO ms_null VALUES (NULL, 100), (2, 200)")
    ctx.sql("MERGE INTO mt_null t USING ms_null s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    rows = sorted(ctx.sql("SELECT k, v FROM mt_null").rows(),
                  key=lambda r: (r[0] is None, r[0]))
    # NULL target row untouched; k=2 updated; NULL source row inserted
    assert rows == [(2, 200), (None, 1), (None, 100)]
