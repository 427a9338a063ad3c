"""DECIMAL type: exact fixed-point semantics."""

from decimal import Decimal

import pytest

from databend_tpu.errors import DatabendError


@pytest.fixture
def ctx(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE dm (id BIGINT, amount DECIMAL(12, 2))")
    c.sql("INSERT INTO dm VALUES (1, '10.25'), (2, '0.10'), (3, NULL), (4, '5.01')")
    return c


def test_decimal_roundtrip_and_exact_sum(ctx):
    rows = ctx.sql("SELECT amount FROM dm ORDER BY id").rows()
    assert rows[0][0] == Decimal("10.25")
    assert rows[2][0] is None
    # 10.25 + 0.10 + 5.01 is exactly 15.36 (floats would drift)
    assert ctx.sql("SELECT sum(amount) FROM dm").scalar() == Decimal("15.36")


def test_decimal_arith_filter_sort(ctx):
    assert ctx.sql("SELECT amount + 1 FROM dm WHERE id = 1").scalar() == Decimal("11.25")
    assert ctx.sql("SELECT amount * 2 FROM dm WHERE id = 2").scalar() == Decimal("0.20")
    rows = ctx.sql("SELECT id FROM dm WHERE amount > 5 ORDER BY amount DESC").rows()
    assert [r[0] for r in rows] == [1, 4]
    assert ctx.sql("SELECT min(amount) FROM dm").scalar() == Decimal("0.10")
    assert ctx.sql("SELECT max(amount) FROM dm").scalar() == Decimal("10.25")


def test_decimal_casts(ctx):
    assert ctx.sql("SELECT CAST('3.14159' AS DECIMAL(6,3))").scalar() == Decimal("3.142")
    assert ctx.sql("SELECT CAST(amount AS DOUBLE) FROM dm WHERE id=1").scalar() == 10.25
    assert ctx.sql("SELECT CAST(amount AS VARCHAR) FROM dm WHERE id=2").scalar() == "0.10"
    assert ctx.sql("SELECT CAST(7 AS DECIMAL(5,2))").scalar() == Decimal("7.00")
    with pytest.raises(DatabendError):
        ctx.sql("SELECT CAST('oops' AS DECIMAL(5,2))")
    assert ctx.sql("SELECT TRY_CAST('oops' AS DECIMAL(5,2))").scalar() is None


def test_decimal_group_by(ctx):
    ctx.sql("CREATE TABLE dg (g VARCHAR, v DECIMAL(10,2))")
    ctx.sql("INSERT INTO dg VALUES ('a','1.10'), ('a','2.20'), ('b','0.05')")
    rows = ctx.sql("SELECT g, sum(v) FROM dg GROUP BY g ORDER BY g").rows()
    assert rows == [("a", Decimal("3.30")), ("b", Decimal("0.05"))]
