"""Table streams (CDC): delta reads + transactional consumption."""

import pytest

from databend_tpu.errors import DatabendError


def test_stream_delta_and_consume(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE src (v BIGINT)")
    c.sql("INSERT INTO src VALUES (1)")
    c.sql("CREATE STREAM st ON TABLE src")
    # nothing since stream creation
    assert c.sql("SELECT count(*) FROM st").scalar() == 0
    c.sql("INSERT INTO src VALUES (2), (3)")
    rows = c.sql("SELECT v, change$action FROM st ORDER BY v").rows()
    assert rows == [(2, "INSERT"), (3, "INSERT")]
    # plain SELECT does not consume
    assert c.sql("SELECT count(*) FROM st").scalar() == 2

    # INSERT ... SELECT FROM stream consumes it
    c.sql("CREATE TABLE tgt (v BIGINT)")
    c.sql("INSERT INTO tgt SELECT v FROM st")
    assert sorted(r[0] for r in c.sql("SELECT v FROM tgt").rows()) == [2, 3]
    assert c.sql("SELECT count(*) FROM st").scalar() == 0
    c.sql("INSERT INTO src VALUES (4)")
    assert c.sql("SELECT count(*) FROM st").scalar() == 1


def test_stream_ddl_and_show(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE s2 (v BIGINT)")
    c.sql("CREATE STREAM stx ON TABLE s2")
    with pytest.raises(DatabendError):
        c.sql("CREATE STREAM stx ON TABLE s2")
    c.sql("CREATE STREAM IF NOT EXISTS stx ON TABLE s2")
    rows = c.sql("SHOW STREAMS").rows()
    assert any("stx" in r[0] for r in rows)
    c.sql("DROP STREAM stx")
    with pytest.raises(DatabendError):
        c.sql("DROP STREAM stx")
    c.sql("DROP STREAM IF EXISTS stx")
