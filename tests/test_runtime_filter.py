"""Join runtime filters: build-side key min/max pushed into the probe
scan so the range pruner skips probe blocks (reference
enable_join_runtime_filter).
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "dr"))
    c.sql("CREATE TABLE facts (k INT, v INT) row_per_block=100")
    c.sql("INSERT INTO facts SELECT number, number * 2 FROM numbers(1000)")
    c.sql("CREATE TABLE dims (k INT, name VARCHAR)")
    c.sql("INSERT INTO dims VALUES (950, 'a'), (990, 'b')")
    return c


def _probe_blocks_scanned(ctx, sql):
    rows = ctx.sql("EXPLAIN ANALYZE " + sql).rows()
    counts = []
    for (line,) in rows:
        if "pruning:" in line and "blocks" in line:
            seg = line.split("blocks ")[1]
            before, after = seg.split(" ")[0].split("->")
            counts.append((int(before), int(after)))
    return counts


def test_inner_join_prunes_probe_blocks(ctx):
    counts = _probe_blocks_scanned(
        ctx, "SELECT f.v, d.name FROM facts f JOIN dims d ON f.k = d.k")
    # the 1000-row probe has 10 blocks; build keys 950..990 fit in one
    assert (10, 1) in counts
    rows = ctx.sql("SELECT f.v, d.name FROM facts f JOIN dims d"
                   " ON f.k = d.k ORDER BY f.v").rows()
    assert rows == [(1900, "a"), (1980, "b")]


def test_left_join_not_filtered(ctx):
    # LEFT join must keep unmatched probe rows: no runtime filter
    counts = _probe_blocks_scanned(
        ctx, "SELECT count(*) FROM facts f LEFT JOIN dims d ON f.k = d.k")
    assert (10, 1) not in counts
    assert ctx.sql("SELECT count(*) FROM facts f LEFT JOIN dims d"
                   " ON f.k = d.k").rows() == [(1000,)]


def test_runtime_filter_disabled_by_setting(ctx):
    ctx.sql("SET enable_join_runtime_filter = 0")
    counts = _probe_blocks_scanned(
        ctx, "SELECT f.v FROM facts f JOIN dims d ON f.k = d.k")
    assert (10, 1) not in counts
    ctx.sql("SET enable_join_runtime_filter = 1")


def test_correctness_with_filter_composition(ctx):
    # runtime filter composes with an existing WHERE pushdown
    rows = ctx.sql("SELECT f.v FROM facts f JOIN dims d ON f.k = d.k"
                   " WHERE f.v > 1900 ORDER BY f.v").rows()
    assert rows == [(1980,)]
