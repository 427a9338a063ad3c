"""Views: CREATE/DROP VIEW, expansion, nesting."""

import pytest

from databend_tpu.errors import DatabendError


def test_view_basic(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE vt0 (v BIGINT)")
    c.sql("INSERT INTO vt0 VALUES (1), (2), (3)")
    c.sql("CREATE VIEW big AS SELECT v FROM vt0 WHERE v > 1")
    assert c.sql("SELECT sum(v) FROM big").scalar() == 5
    # views compose with joins and nesting
    c.sql("CREATE VIEW bigger AS SELECT v * 10 AS w FROM big")
    rows = c.sql("SELECT w FROM bigger ORDER BY w").rows()
    assert [r[0] for r in rows] == [20, 30]


def test_view_replace_and_drop(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE vt1 (v BIGINT)")
    c.sql("INSERT INTO vt1 VALUES (1), (5)")
    c.sql("CREATE VIEW w1 AS SELECT v FROM vt1")
    with pytest.raises(DatabendError):
        c.sql("CREATE VIEW w1 AS SELECT v FROM vt1")
    c.sql("CREATE OR REPLACE VIEW w1 AS SELECT v FROM vt1 WHERE v > 2")
    assert c.sql("SELECT count(*) FROM w1").scalar() == 1
    c.sql("DROP VIEW w1")
    with pytest.raises(DatabendError):
        c.sql("SELECT * FROM w1")
    with pytest.raises(DatabendError):
        c.sql("DROP VIEW w1")
    c.sql("DROP VIEW IF EXISTS w1")
