"""Time travel (AT SNAPSHOT/OFFSET/TIMESTAMP), FLASHBACK, CLUSTER BY."""

import time

import numpy as np
import pytest

from databend_tpu.errors import DatabendError


def test_at_snapshot_and_offset(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE tt (v BIGINT)")
    c.sql("INSERT INTO tt VALUES (1)")
    t = c.table("tt")
    snap1 = t.read_snapshot().snapshot_id
    ts_between = time.time()
    time.sleep(0.02)
    c.sql("INSERT INTO tt VALUES (2), (3)")

    assert c.sql("SELECT count(*) FROM tt").scalar() == 3
    assert c.sql(f"SELECT count(*) FROM tt AT (SNAPSHOT => '{snap1}')").scalar() == 1
    # timestamp travel lands on the first snapshot
    import datetime
    iso = datetime.datetime.fromtimestamp(
        ts_between, datetime.timezone.utc).isoformat()
    assert c.sql(f"SELECT count(*) FROM tt AT (TIMESTAMP => '{iso}')").scalar() == 1
    # history: two snapshots, head first
    hist = t.snapshot_history()
    assert len(hist) == 2 and hist[1].snapshot_id == snap1


def test_flashback(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE fb (v BIGINT)")
    c.sql("INSERT INTO fb VALUES (1)")
    snap1 = c.table("fb").read_snapshot().snapshot_id
    c.sql("INSERT INTO fb VALUES (2)")
    assert c.sql("SELECT count(*) FROM fb").scalar() == 2
    c.sql(f"ALTER TABLE fb FLASHBACK TO (SNAPSHOT => '{snap1}')")
    assert c.sql("SELECT count(*) FROM fb").scalar() == 1
    # writes continue from the flashback point
    c.sql("INSERT INTO fb VALUES (9)")
    rows = sorted(r[0] for r in c.sql("SELECT v FROM fb").rows())
    assert rows == [1, 9]


def test_unknown_snapshot_errors(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ts2 (v BIGINT)")
    c.sql("INSERT INTO ts2 VALUES (1)")
    with pytest.raises(DatabendError):
        c.sql("SELECT * FROM ts2 AT (SNAPSHOT => 'nope')")


def test_cluster_by_vector_tightens_blocks(tmp_catalog, rng):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import VectorType
    c = tmp_catalog
    c.sql("CREATE TABLE cl (id BIGINT, emb VECTOR(8),"
          " VECTOR INDEX cl_v (emb) distance='l2') CLUSTER BY (emb)"
          " ROW_PER_BLOCK='64'")
    # two well-separated gaussian blobs, interleaved on insert
    a = rng.standard_normal((64, 8)).astype(np.float32)
    b = rng.standard_normal((64, 8)).astype(np.float32) + 50.0
    mixed = np.empty((128, 8), np.float32)
    mixed[0::2], mixed[1::2] = a, b
    blk = DataBlock(["id", "emb"],
                    [Column.from_numpy(np.arange(128, dtype=np.int64)),
                     Column.from_numpy(mixed, VectorType(8))])
    c.insert_block("cl", blk)
    t = c.table("cl")
    snap = t.read_snapshot()
    segs = t.read_segments(snap)
    metas = [m for s in segs for m in s.blocks]
    assert len(metas) == 2
    # k-means ordering separates the blobs: per-block id sets are the evens
    # and odds (blob a = even ids, blob b = odd ids)
    blocks = [t.read_block(m, ["id"]) for m in metas]
    sets = [set(b.column("id").to_pylist()) for b in blocks]
    evens = set(range(0, 128, 2))
    odds = set(range(1, 128, 2))
    assert sets[0] in (evens, odds) and sets[1] in (evens, odds) and sets[0] != sets[1]


def test_cluster_by_scalar_sorts(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE cs (v BIGINT) CLUSTER BY (v) ROW_PER_BLOCK='4'")
    c.sql("INSERT INTO cs VALUES (5), (1), (9), (3), (7), (2), (8), (4)")
    t = c.table("cs")
    metas = [m for s in t.read_segments(t.read_snapshot()) for m in s.blocks]
    assert len(metas) == 2
    mins = sorted(m.col_stats["v"].min for m in metas)
    maxs = sorted(m.col_stats["v"].max for m in metas)
    assert mins == [1, 5] and maxs == [4, 9]  # non-overlapping ranges


def test_undrop_table(tmp_catalog):
    import pytest
    from databend_tpu.errors import DatabendError
    c = tmp_catalog
    c.sql("CREATE TABLE ud (v BIGINT)")
    c.sql("INSERT INTO ud VALUES (7), (8)")
    c.sql("DROP TABLE ud")
    with pytest.raises(DatabendError):
        c.sql("SELECT * FROM ud")
    c.sql("UNDROP TABLE ud")
    assert sorted(r[0] for r in c.sql("SELECT v FROM ud").rows()) == [7, 8]
    with pytest.raises(DatabendError):
        c.sql("UNDROP TABLE ud")  # nothing dropped anymore
    # name collision: recreate then undrop of the old one must fail
    c.sql("DROP TABLE ud")
    c.sql("CREATE TABLE ud (v BIGINT)")
    with pytest.raises(DatabendError):
        c.sql("UNDROP TABLE ud")
