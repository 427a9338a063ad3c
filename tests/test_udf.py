"""Lambda UDFs (CREATE FUNCTION f AS (x) -> expr)."""

import pytest

from databend_tpu.errors import DatabendError


def test_udf_basic(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE FUNCTION plus_one AS (x) -> x + 1")
    assert c.sql("SELECT plus_one(41)").scalar() == 42
    c.sql("CREATE TABLE ut (v BIGINT)")
    c.sql("INSERT INTO ut VALUES (1), (2), (3)")
    rows = c.sql("SELECT plus_one(v) FROM ut WHERE plus_one(v) > 2 ORDER BY v").rows()
    assert [r[0] for r in rows] == [3, 4]


def test_udf_multi_arg_and_nested(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE FUNCTION hyp AS (a, b) -> sqrt(a * a + b * b)")
    c.sql("CREATE FUNCTION hyp3 AS (a, b, c) -> hyp(hyp(a, b), c)")
    assert abs(c.sql("SELECT hyp(3, 4)").scalar() - 5.0) < 1e-9
    assert abs(c.sql("SELECT hyp3(2, 3, 6)").scalar() - 7.0) < 1e-9


def test_udf_replace_drop_errors(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE FUNCTION f1 AS (x) -> x * 2")
    with pytest.raises(DatabendError):
        c.sql("CREATE FUNCTION f1 AS (x) -> x * 3")
    c.sql("CREATE OR REPLACE FUNCTION f1 AS (x) -> x * 3")
    assert c.sql("SELECT f1(2)").scalar() == 6
    with pytest.raises(DatabendError):
        c.sql("CREATE FUNCTION abs AS (x) -> x")  # built-in shadowing
    with pytest.raises(DatabendError):
        c.sql("SELECT f1(1, 2)")  # arity
    c.sql("DROP FUNCTION f1")
    with pytest.raises(DatabendError):
        c.sql("SELECT f1(1)")
    with pytest.raises(DatabendError):
        c.sql("DROP FUNCTION f1")
    c.sql("DROP FUNCTION IF EXISTS f1")


def test_udf_persists_across_sessions(tmp_catalog):
    from databend_tpu.service.session import SessionContext
    c = tmp_catalog
    c.sql("CREATE FUNCTION persisted AS (x) -> x - 1")
    c2 = SessionContext(data_root=c.data_root)
    assert c2.sql("SELECT persisted(10)").scalar() == 9
