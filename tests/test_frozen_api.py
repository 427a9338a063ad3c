"""Frozen on-disk API guard.

Reference: src/common/frozen_api — a derive that fails the build when a
struct that is serialized to disk changes shape silently. Here: exact
key-set assertions on every persisted codec (snapshot, segment, block
meta, table info, schema field). Changing these dicts is a FORMAT CHANGE:
update this test deliberately and handle old payloads in from_dict.
"""

from databend_tpu import SessionContext


def test_snapshot_codec_frozen(tmp_path):
    ctx = SessionContext(data_root=str(tmp_path / "dr"))
    ctx.sql("CREATE TABLE t (id INT, v VECTOR(4))")
    ctx.sql("INSERT INTO t VALUES (1, [1.0,0.0,0.0,0.0])")
    t = ctx.table("t")
    snap = t.read_snapshot()
    d = snap.to_dict()
    assert set(d) == {"snapshot_id", "segments", "row_count", "block_count",
                      "index_size", "prev_snapshot", "timestamp", "schema"}
    assert set(d["schema"]) == {"fields", "next_column_id"}
    f0 = d["schema"]["fields"][0]
    assert set(f0) == {"name", "type", "default", "column_id"}
    # prior_names appears only after RENAME COLUMN (back-compat: absent key)
    ctx.sql("ALTER TABLE t RENAME COLUMN id TO id2")
    ctx.sql("INSERT INTO t VALUES (2, [0.0,1.0,0.0,0.0])")
    d2 = ctx.table("t").read_snapshot().to_dict()
    f0 = d2["schema"]["fields"][0]
    assert set(f0) == {"name", "type", "default", "column_id", "prior_names"}


def test_segment_and_block_codec_frozen(tmp_path):
    ctx = SessionContext(data_root=str(tmp_path / "dr"))
    ctx.sql("CREATE TABLE t (id INT)")
    ctx.sql("INSERT INTO t VALUES (1), (2)")
    t = ctx.table("t")
    seg = t.read_segments(t.read_snapshot())[0]
    d = seg.to_dict()
    assert set(d) >= {"blocks", "row_count"}
    b = d["blocks"][0]
    required = {"location", "row_count", "col_stats"}
    assert required <= set(b), f"block meta lost keys: {required - set(b)}"


def test_table_info_codec_frozen(tmp_path):
    ctx = SessionContext(data_root=str(tmp_path / "dr"))
    ctx.sql("CREATE TABLE t (id INT)")
    info = ctx.catalog.get_table("default", "t")
    d = info.to_dict()
    assert {"table_id", "database", "name", "schema", "engine",
            "options"} <= set(d), d.keys()


def test_old_snapshot_payload_still_reads():
    """A snapshot dict written before the schema field existed must load."""
    from databend_tpu.storage.fuse.snapshot import TableSnapshot
    old = {"snapshot_id": "abc", "segments": ["s1"], "row_count": 3,
           "block_count": 1, "index_size": 0, "prev_snapshot": None,
           "timestamp": 1.0}
    snap = TableSnapshot.from_dict(old)
    assert snap.schema is None
    assert snap.row_count == 3


def test_old_datafield_payload_still_reads():
    from databend_tpu.expression.schema import DataField
    f = DataField.from_dict({"name": "x", "type": "INT", "default": None,
                             "column_id": 0})
    assert f.prior_names == []
