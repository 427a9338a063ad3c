"""Paimon external table engine: spec-shaped fixture written from scratch
(snapshot JSON + avro manifest list + avro manifest + parquet data in
bucket dirs), read through ENGINE=PAIMON.

Reference: the paimon external engine under src/query/storages.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from databend_tpu import SessionContext
from databend_tpu.formats.avro import write_avro_records

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file_meta", "fields": [
        {"name": "_FILE_NAME", "type": "string"},
        {"name": "_FILE_SIZE", "type": "long"},
        {"name": "_NUM_ADDED_FILES", "type": "long"},
    ]}

MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "_KIND", "type": "int"},
        {"name": "_BUCKET", "type": "int"},
        {"name": "_FILE", "type": {
            "type": "record", "name": "data_file_meta", "fields": [
                {"name": "_FILE_NAME", "type": "string"},
                {"name": "_FILE_SIZE", "type": "long"},
                {"name": "_ROW_COUNT", "type": "long"},
            ]}},
    ]}


def write_paimon_table(root, rows_by_file, deleted_files=()):
    """rows_by_file: {filename: [(id, name, score)]}; files land in
    bucket-0; deleted_files get a delete manifest entry."""
    os.makedirs(os.path.join(root, "snapshot"))
    os.makedirs(os.path.join(root, "manifest"))
    os.makedirs(os.path.join(root, "schema"))
    os.makedirs(os.path.join(root, "bucket-0"))
    with open(os.path.join(root, "schema", "schema-0"), "w") as f:
        json.dump({"id": 0, "fields": [
            {"id": 0, "name": "id", "type": "BIGINT NOT NULL"},
            {"id": 1, "name": "name", "type": "STRING"},
            {"id": 2, "name": "score", "type": "DOUBLE"},
        ], "partitionKeys": [], "primaryKeys": []}, f)
    entries = []
    for fname, rows in rows_by_file.items():
        path = os.path.join(root, "bucket-0", fname)
        t = pa.table({"id": pa.array([r[0] for r in rows], pa.int64()),
                      "name": pa.array([r[1] for r in rows], pa.string()),
                      "score": pa.array([r[2] for r in rows], pa.float64())})
        pq.write_table(t, path)
        entries.append({"_KIND": 0, "_BUCKET": 0,
                        "_FILE": {"_FILE_NAME": fname,
                                  "_FILE_SIZE": os.path.getsize(path),
                                  "_ROW_COUNT": len(rows)}})
    for fname in deleted_files:
        entries.append({"_KIND": 1, "_BUCKET": 0,
                        "_FILE": {"_FILE_NAME": fname, "_FILE_SIZE": 0,
                                  "_ROW_COUNT": 0}})
    manifest = os.path.join(root, "manifest", "manifest-0")
    write_avro_records(manifest, MANIFEST_SCHEMA, entries)
    mlist = os.path.join(root, "manifest", "manifest-list-0")
    write_avro_records(mlist, MANIFEST_LIST_SCHEMA, [{
        "_FILE_NAME": "manifest-0",
        "_FILE_SIZE": os.path.getsize(manifest),
        "_NUM_ADDED_FILES": len(rows_by_file)}])
    with open(os.path.join(root, "snapshot", "snapshot-1"), "w") as f:
        json.dump({"version": 3, "id": 1, "schemaId": 0,
                   "baseManifestList": "manifest-list-0",
                   "deltaManifestList": None,
                   "commitKind": "APPEND"}, f)
    with open(os.path.join(root, "snapshot", "LATEST"), "w") as f:
        f.write("1")


def test_paimon_basic(tmp_path):
    root = str(tmp_path / "pmt")
    write_paimon_table(root, {
        "data-0.parquet": [(1, "a", 1.5), (2, "b", 2.5)],
        "data-1.parquet": [(3, "c", 3.5)],
    })
    ctx = SessionContext(data_root=str(tmp_path / "cat"))
    ctx.sql(f"CREATE TABLE pm ENGINE=PAIMON LOCATION='{root}'")
    r = ctx.sql("SELECT id, name, score FROM pm ORDER BY id")
    assert r.to_pydict() == {"id": [1, 2, 3], "name": ["a", "b", "c"],
                             "score": [1.5, 2.5, 3.5]}
    # schema inferred from schema-0, NOT NULL respected
    cols = ctx.sql("SELECT name, type FROM system.columns"
                   " WHERE table = 'pm'").rows()
    types = {r[0]: r[1] for r in cols}
    assert "BIGINT" in types["id"].upper()


def test_paimon_delete_reconciliation(tmp_path):
    root = str(tmp_path / "pmt2")
    write_paimon_table(root, {
        "data-0.parquet": [(1, "a", 1.0)],
        "data-1.parquet": [(2, "b", 2.0)],
    }, deleted_files=("data-0.parquet",))
    ctx = SessionContext(data_root=str(tmp_path / "cat"))
    ctx.sql(f"CREATE TABLE pm2 ENGINE=PAIMON LOCATION='{root}'")
    assert ctx.sql("SELECT id FROM pm2").to_pydict()["id"] == [2]


def test_paimon_read_only(tmp_path):
    import pytest
    from databend_tpu.errors import UnsupportedFeature
    root = str(tmp_path / "pmt3")
    write_paimon_table(root, {"data-0.parquet": [(1, "a", 1.0)]})
    ctx = SessionContext(data_root=str(tmp_path / "cat"))
    ctx.sql(f"CREATE TABLE pm3 ENGINE=PAIMON LOCATION='{root}'")
    with pytest.raises(UnsupportedFeature):
        ctx.sql("INSERT INTO pm3 VALUES (9, 'x', 9.0)")
