"""Iceberg external table engine: spec-conformant fixture written from
scratch (metadata JSON + avro manifest list + avro manifest + parquet),
then read through ENGINE=ICEBERG.

Reference: src/query/storages/iceberg (iceberg-rust based reader).
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from databend_tpu import SessionContext
from databend_tpu.formats.avro import write_avro_records

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ]}

MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ]}},
    ]}


def write_iceberg_table(root, rows_by_file, deleted_files=()):
    """rows_by_file: {filename: list of (id, name, score)}."""
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    entries = []
    for fname, rows in rows_by_file.items():
        path = os.path.join(root, "data", fname)
        t = pa.table({"id": pa.array([r[0] for r in rows], pa.int64()),
                      "name": pa.array([r[1] for r in rows], pa.string()),
                      "score": pa.array([r[2] for r in rows], pa.float64())})
        pq.write_table(t, path)
        entries.append({
            "status": 2 if fname in deleted_files else 1,
            "snapshot_id": 1,
            "data_file": {"content": 0,
                          "file_path": f"file://{path}",
                          "file_format": "PARQUET",
                          "record_count": len(rows),
                          "file_size_in_bytes": os.path.getsize(path)}})
    manifest = os.path.join(root, "metadata", "m0.avro")
    write_avro_records(manifest, MANIFEST_SCHEMA, entries)
    mlist = os.path.join(root, "metadata", "snap-1.avro")
    write_avro_records(mlist, MANIFEST_LIST_SCHEMA, [{
        "manifest_path": f"file://{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0, "added_snapshot_id": 1}])
    meta = {
        "format-version": 2,
        "table-uuid": "0000-test",
        "location": root,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": True, "type": "long"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
            {"id": 3, "name": "score", "required": False, "type": "double"},
        ]}],
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1000,
                       "manifest-list": f"file://{mlist}"}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_iceberg_read_with_inferred_schema(ctx, tmp_path):
    root = str(tmp_path / "ice")
    write_iceberg_table(root, {
        "f1.parquet": [(1, "a", 1.5), (2, "b", 2.5)],
        "f2.parquet": [(3, "c", 3.5)],
    })
    ctx.sql(f"CREATE TABLE ice ENGINE=ICEBERG LOCATION='{root}'")
    d = ctx.sql("DESCRIBE ice").to_pydict()
    assert d["field"] == ["id", "name", "score"]
    rows = ctx.sql("SELECT id, name, score FROM ice ORDER BY id").rows()
    assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]
    assert ctx.sql("SELECT sum(score) FROM ice WHERE id > 1").rows() == [(6.0,)]


def test_iceberg_deleted_manifest_entries_skipped(ctx, tmp_path):
    root = str(tmp_path / "ice2")
    write_iceberg_table(root, {
        "keep.parquet": [(1, "k", 0.0)],
        "gone.parquet": [(2, "g", 0.0)],
    }, deleted_files={"gone.parquet"})
    ctx.sql(f"CREATE TABLE ice2 ENGINE=ICEBERG LOCATION='{root}'")
    assert ctx.sql("SELECT id FROM ice2").rows() == [(1,)]


def test_iceberg_read_only(ctx, tmp_path):
    root = str(tmp_path / "ice3")
    write_iceberg_table(root, {"f.parquet": [(1, "x", 0.5)]})
    ctx.sql(f"CREATE TABLE ice3 ENGINE=ICEBERG LOCATION='{root}'")
    with pytest.raises(Exception):
        ctx.sql("INSERT INTO ice3 VALUES (9, 'z', 0.0)")
