"""RECLUSTER: re-sort the table by cluster keys, rewriting blocks.

Reference: recluster operations + clustering_history_table.rs. For vector
cluster keys this restores per-block centroid/radius tightness (the
routing-prune quality knob of the IVF-style path).
"""

import numpy as np
import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_recluster_scalar_keys(ctx):
    ctx.sql("CREATE TABLE t (k INT, v INT) CLUSTER BY (k) row_per_block=4")
    # interleaved appends -> blocks with overlapping k ranges
    ctx.sql("INSERT INTO t VALUES (1,1), (9,1), (2,1), (8,1)")
    ctx.sql("INSERT INTO t VALUES (3,1), (7,1), (4,1), (6,1)")
    ctx.sql("OPTIMIZE TABLE t RECLUSTER")
    t = ctx.table("t")
    segs = t.read_segments(t.read_snapshot())
    blocks = [b for s in segs for b in s.blocks]
    # after recluster, block k-ranges are disjoint (globally sorted)
    ranges = sorted((b.col_stats["k"].min, b.col_stats["k"].max)
                    for b in blocks)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # data intact
    assert ctx.sql("SELECT count(*), sum(k) FROM t").rows() == [(8, 40)]


def test_recluster_vector_keys_tightens_blocks(ctx):
    # inline index required at CREATE time for vector cluster keys
    # (reference-parity validation, 09_0000_vector_index_base.test)
    ctx.sql("CREATE TABLE vt (id INT, emb VECTOR(8),"
            " VECTOR INDEX vi (emb) distance='l2')"
            " CLUSTER BY (emb) row_per_block=32")
    rng = np.random.default_rng(0)
    # two far-apart clusters, inserted interleaved in many small appends
    a = rng.standard_normal((32, 8)) * 0.1
    b = rng.standard_normal((32, 8)) * 0.1 + 50.0
    rows = []
    for i in range(32):
        rows.append((i, a[i]))
        rows.append((100 + i, b[i]))
    for start in range(0, 64, 8):  # 8 small interleaved appends
        chunk = rows[start:start + 8]
        vals = ",".join(
            f"({i}, [{','.join(f'{x:.4f}' for x in v)}])" for i, v in chunk)
        ctx.sql(f"INSERT INTO vt VALUES {vals}")
    ctx.sql("ALTER TABLE vt RECLUSTER")
    t = ctx.table("vt")
    segs = t.read_segments(t.read_snapshot())
    blocks = [bl for s in segs for bl in s.blocks]
    # every block's radius must now be small (single-cluster purity):
    # pre-recluster each append mixed both clusters (radius ~ 25+)
    for bl in blocks:
        entry = bl.vector_indexes.get("vi")
        assert entry is not None and "stats" in entry
        radius = entry["stats"]["radius"]
        assert max(radius.values()) < 10.0
    assert ctx.sql("SELECT count(*) FROM vt").rows() == [(64,)]
    # search still exact
    q = "[" + ",".join(f"{x:.4f}" for x in b[3]) + "]"
    assert ctx.sql(f"SELECT id FROM vt ORDER BY l2_distance(emb, {q})"
                   " LIMIT 1").rows() == [(103,)]


def test_clustering_history(ctx):
    ctx.sql("CREATE TABLE h (k INT) CLUSTER BY (k) row_per_block=2")
    ctx.sql("INSERT INTO h VALUES (3), (1), (2)")
    ctx.sql("OPTIMIZE TABLE h RECLUSTER")
    rows = ctx.sql("SELECT table, blocks_after FROM"
                   " system.clustering_history").rows()
    assert rows and rows[0][0] == "default.h"
