"""External sort spill path."""

import numpy as np


def test_sort_spill_matches_in_memory(tmp_catalog, rng):
    c = tmp_catalog
    c.sql("CREATE TABLE sp (v BIGINT, s VARCHAR)")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Int64, String
    n = 5000
    vals = rng.integers(0, 1000, size=n).astype(np.int64)
    strs = [f"s{v % 7}" for v in vals]
    c.insert_block("sp", DataBlock(
        ["v", "s"], [Column.from_numpy(vals), Column.from_pylist(strs, String)]))

    expected = c.sql("SELECT v, s FROM sp ORDER BY v, s").rows()
    # force the spill path
    c.sql("SET sort_spill_row_threshold = 1000")
    got = c.sql("SELECT v, s FROM sp ORDER BY v, s").rows()
    assert got == expected

    from databend_tpu.utils.metrics import METRICS
    assert METRICS.snapshot().get("sort_spill_runs", 0) >= 4


def test_sort_spill_with_nulls(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE spn (v BIGINT)")
    c.sql("INSERT INTO spn VALUES (3), (NULL), (1), (2), (NULL)")
    c.sql("SET sort_spill_row_threshold = 2")
    rows = [r[0] for r in c.sql("SELECT v FROM spn ORDER BY v").rows()]
    assert rows == [1, 2, 3, None, None]  # NULLs last on ASC (default)


def test_aggregate_spill_matches_in_memory(tmp_catalog, rng):
    """Grace hash-partitioned GROUP BY under a tiny buffered-rows budget."""
    c = tmp_catalog
    c.sql("CREATE TABLE ag (k BIGINT, s VARCHAR, v DOUBLE) ROW_PER_BLOCK='512'")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Float64, String
    n = 20_000
    keys = rng.integers(0, 500, size=n).astype(np.int64)
    strs = [f"g{k % 11}" for k in keys]
    vals = rng.standard_normal(n)
    c.insert_block("ag", DataBlock(
        ["k", "s", "v"],
        [Column.from_numpy(keys), Column.from_pylist(strs, String),
         Column.from_numpy(vals)]))

    q = ("SELECT k, s, count(*), sum(v), min(v), max(v), avg(v)"
         " FROM ag GROUP BY k, s ORDER BY k, s")
    expected = c.sql(q).rows()
    c.sql("SET aggregate_spill_row_threshold = 1000")
    got = c.sql(q).rows()
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:3] == e[:3]
        for a, b in zip(g[3:], e[3:]):
            assert abs(a - b) < 1e-9 * max(1.0, abs(b))

    from databend_tpu.utils.metrics import METRICS
    assert METRICS.snapshot().get("aggregate_spill_rows", 0) >= n


def test_aggregate_spill_with_null_keys(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE agn (k BIGINT, v BIGINT)")
    c.sql("INSERT INTO agn VALUES (1, 10), (NULL, 5), (1, 20), (NULL, 7), (2, 1)")
    c.sql("SET aggregate_spill_row_threshold = 2")
    rows = c.sql("SELECT k, sum(v) FROM agn GROUP BY k ORDER BY k").rows()
    assert [tuple(r) for r in rows] == [(1, 30), (2, 1), (None, 12)]


def test_join_spill_matches_in_memory(tmp_catalog, rng):
    """Grace partitioned hash join: build side over the spill budget."""
    c = tmp_catalog
    c.sql("CREATE TABLE jl (k BIGINT, lv BIGINT) ROW_PER_BLOCK='512'")
    c.sql("CREATE TABLE jr (k BIGINT, rv VARCHAR) ROW_PER_BLOCK='512'")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import String
    nl, nr = 6000, 4000
    lk = rng.integers(0, 800, size=nl).astype(np.int64)
    rk = rng.integers(0, 800, size=nr).astype(np.int64)
    c.insert_block("jl", DataBlock(
        ["k", "lv"], [Column.from_numpy(lk),
                      Column.from_numpy(np.arange(nl, dtype=np.int64))]))
    c.insert_block("jr", DataBlock(
        ["k", "rv"], [Column.from_numpy(rk),
                      Column.from_pylist([f"r{i}" for i in range(nr)], String)]))

    for kind in ("JOIN", "LEFT JOIN"):
        q = (f"SELECT jl.k, lv, rv FROM jl {kind} jr ON jl.k = jr.k"
             " ORDER BY jl.k, lv, rv")
        c.sql("SET join_spill_row_threshold = 0")
        expected = c.sql(q).rows()
        c.sql("SET join_spill_row_threshold = 500")
        got = c.sql(q).rows()
        assert got == expected, kind

    from databend_tpu.utils.metrics import METRICS
    assert METRICS.snapshot().get("join_spill_queries", 0) >= 1


def test_join_spill_right_and_nulls(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE jnl (k BIGINT)")
    c.sql("CREATE TABLE jnr (k BIGINT)")
    c.sql("INSERT INTO jnl VALUES (1), (NULL), (2), (3)")
    c.sql("INSERT INTO jnr VALUES (2), (NULL), (3), (4)")
    c.sql("SET join_spill_row_threshold = 1")
    rows = c.sql("SELECT jnl.k, jnr.k FROM jnl RIGHT JOIN jnr"
                 " ON jnl.k = jnr.k ORDER BY jnr.k").rows()
    # NULL keys never match; RIGHT join keeps every right row
    assert [tuple(r) for r in rows] == [(2, 2), (3, 3), (None, 4),
                                        (None, None)]


def test_window_spill_parity(tmp_path):
    """Window spill: hash-partitioned by PARTITION BY keys; results match
    the in-memory path exactly (reference window_partition spill)."""
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "ws"))
    ctx.sql("CREATE TABLE w (g INT, v INT)")
    ctx.sql("INSERT INTO w SELECT number % 50, number FROM numbers(20000)")
    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,"
         " sum(v) OVER (PARTITION BY g) AS s FROM w QUALIFY rn <= 2"
         " ORDER BY g, rn")
    base = ctx.sql(q).rows()
    ctx.sql("SET window_spill_row_threshold = 1000")
    assert ctx.sql(q).rows() == base
    # unpartitioned windows can't hash-partition: stays in memory, correct
    q2 = "SELECT max(v) OVER () FROM w LIMIT 1"
    assert ctx.sql(q2).rows() == [(19999,)]
    ctx.sql("SET window_spill_row_threshold = 0")
    assert ctx.sql(q).rows() == base


def test_remote_spill_via_operator(tmp_catalog, rng):
    """spill_storage_location routes sort/agg/join spills through the
    DataOperator (memory:// here; s3:// in production — reference
    spillers/inner.rs:269 spills to disk OR object storage)."""
    c = tmp_catalog
    c.sql("CREATE TABLE rs (k BIGINT, v DOUBLE) ROW_PER_BLOCK='512'")
    from databend_tpu.expression import Column, DataBlock
    n = 8000
    keys = rng.integers(0, 300, size=n).astype(np.int64)
    vals = rng.standard_normal(n)
    c.insert_block("rs", DataBlock(
        ["k", "v"], [Column.from_numpy(keys), Column.from_numpy(vals)]))
    q_sort = "SELECT k, v FROM rs ORDER BY k, v"
    q_agg = "SELECT k, count(*), sum(v) FROM rs GROUP BY k ORDER BY k"
    q_join = ("SELECT a.k, count(*) FROM rs a JOIN rs b ON a.k = b.k"
              " GROUP BY a.k ORDER BY a.k")
    expected = [c.sql(q).rows() for q in (q_sort, q_agg, q_join)]
    c.sql("SET spill_storage_location = 'memory://spill'")
    c.sql("SET sort_spill_row_threshold = 1000")
    c.sql("SET aggregate_spill_row_threshold = 1000")
    c.sql("SET join_spill_row_threshold = 1000")
    from databend_tpu.storage.operator import OPERATOR
    written = []
    orig_write = OPERATOR.write_bytes
    OPERATOR.write_bytes = lambda p, d: (written.append(p),
                                         orig_write(p, d))[1]
    try:
        got = [c.sql(q).rows() for q in (q_sort, q_agg, q_join)]
    finally:
        OPERATOR.write_bytes = orig_write
    for g, e in zip(got, expected):
        assert len(g) == len(e)
        for gr, er in zip(g, e):
            assert gr[0] == er[0]
            for a, b in zip(gr[1:], er[1:]):
                assert abs(a - b) < 1e-9 * max(1.0, abs(b))
    # every spill write went through the operator at the remote prefix,
    # and cleanup removed the runs afterwards
    spill_writes = [p for p in written if p.startswith("memory://spill/")]
    assert any("dbtpu_spill_" in p for p in spill_writes), written[:5]
    assert any("aggspill" in p for p in spill_writes)
    assert any("joinspill" in p for p in spill_writes)
    be = OPERATOR.backend_for("memory://spill")
    assert not [k for k in be.list("memory://spill")
                if "dbtpu_spill_" in k or "joinspill" in k]
