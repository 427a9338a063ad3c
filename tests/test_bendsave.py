"""Backup/restore round-trip (bendsave-equivalent)."""

import pytest

from databend_tpu.errors import DatabendError
from databend_tpu.service.session import SessionContext
from databend_tpu.tools.bendsave import backup, restore


def test_backup_restore_roundtrip(tmp_path):
    root1 = str(tmp_path / "a")
    c = SessionContext(data_root=root1)
    c.sql("CREATE TABLE bk (id BIGINT, emb VECTOR(4))")
    c.sql("CREATE VECTOR INDEX bki ON bk(emb) distance='l2'")
    c.sql("INSERT INTO bk VALUES (1, [1.0,0,0,0]), (2, [0,1.0,0,0])")
    c.meta.close()

    dest = str(tmp_path / "backup.tgz")
    m = backup(root1, dest)
    assert m["file_count"] > 3

    root2 = str(tmp_path / "b")
    restore(dest, root2)
    c2 = SessionContext(data_root=root2)
    rows = c2.sql("SELECT id FROM bk ORDER BY l2_distance(emb, [1.0,0,0,0]) LIMIT 1").rows()
    assert rows == [(1,)]


def test_restore_refuses_nonempty_and_corrupt(tmp_path):
    root = str(tmp_path / "x")
    c = SessionContext(data_root=root)
    c.sql("CREATE TABLE t2 (v BIGINT)")
    c.meta.close()
    dest = str(tmp_path / "b.tgz")
    backup(root, dest)
    with pytest.raises(DatabendError):
        restore(dest, root)  # non-empty destination
    with pytest.raises(DatabendError):
        restore(str(tmp_path / "missing.tgz"), str(tmp_path / "y"))
