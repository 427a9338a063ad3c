"""DataOperator (object storage abstraction) unit tests.

Reference behavior: opendal DataOperator (src/common/storage) — flat
keyspace puts/gets/list for object stores, atomic local-fs writes.
"""

import numpy as np
import pytest

from databend_tpu.storage.operator import (OPERATOR, DataOperator,
                                           MemoryBackend)


def test_fs_roundtrip(tmp_path):
    p = str(tmp_path / "a" / "b.bin")
    OPERATOR.write_bytes(p, b"hello")  # creates parent dirs
    assert OPERATOR.exists(p)
    assert OPERATOR.read_bytes(p) == b"hello"
    assert OPERATOR.size(p) == 5
    assert OPERATOR.list(str(tmp_path)) == [p]
    OPERATOR.delete(p)
    assert not OPERATOR.exists(p)


def test_memory_scheme_flat_keyspace():
    root = "memory://op-test/x"
    OPERATOR.write_bytes(f"{root}/k1", b"1")
    OPERATOR.write_bytes(f"{root}/sub/k2", b"22")
    assert OPERATOR.read_bytes(f"{root}/k1") == b"1"
    assert OPERATOR.exists(root)          # prefix existence
    assert OPERATOR.exists(f"{root}/sub")
    assert len(OPERATOR.list(root)) == 2
    assert OPERATOR.size(f"{root}/sub/k2") == 2
    # last-write-wins
    OPERATOR.write_bytes(f"{root}/k1", b"new")
    assert OPERATOR.read_bytes(f"{root}/k1") == b"new"
    OPERATOR.delete(f"{root}/k1")
    with pytest.raises(FileNotFoundError):
        OPERATOR.read_bytes(f"{root}/k1")


def test_s3_scheme_routes_to_double():
    OPERATOR.write_bytes("s3://b/p/k", b"x")
    assert OPERATOR.read_bytes("s3://b/p/k") == b"x"
    assert "s3://b/p/k" in OPERATOR.list("s3://b/p")


def test_npz_over_operator():
    buf_path = "memory://op-test/arr.npz"
    import io
    b = io.BytesIO()
    np.savez_compressed(b, a=np.arange(10))
    OPERATOR.write_bytes(buf_path, b.getvalue())
    z = np.load(OPERATOR.open_read(buf_path))
    assert z["a"].sum() == 45


def test_full_engine_on_object_store_vacuum_and_timetravel():
    """Snapshots, compaction, vacuum, and time travel all through the
    object store (the defining reference deployment model)."""
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root="s3://opbucket/wh1")
    c.sql("CREATE TABLE ot (v BIGINT)")
    c.sql("INSERT INTO ot VALUES (1)")
    c.sql("INSERT INTO ot VALUES (2)")
    snaps = c.sql("SELECT snapshot_id FROM fuse_snapshot('default','ot')").rows()
    assert len(snaps) == 2
    first = snaps[-1][0]
    assert c.sql(f"SELECT count(*) FROM ot AT (SNAPSHOT => '{first}')").scalar() == 1
    c.sql("OPTIMIZE TABLE ot ALL")
    assert c.sql("SELECT sum(v) FROM ot").scalar() == 3
