"""AGGREGATING INDEX: materialized per-block aggregate partials
(reference: TableIndexType::Aggregating + agg_index pushdown)."""

import numpy as np
import pytest

from databend_tpu.errors import SemanticError
from databend_tpu.utils.metrics import METRICS


@pytest.fixture
def ai_ctx(tmp_catalog, rng):
    c = tmp_catalog
    c.sql("CREATE TABLE sales (region BIGINT, sku VARCHAR, amount DOUBLE,"
          " qty BIGINT) ROW_PER_BLOCK='256'")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import String
    n = 3000
    region = (np.arange(n) % 7).astype(np.int64)
    sku = [f"sku{i % 4}" for i in range(n)]
    amount = rng.uniform(0, 100, n)
    qty = rng.integers(1, 10, n).astype(np.int64)
    c.insert_block("sales", DataBlock(
        ["region", "sku", "amount", "qty"],
        [Column.from_numpy(region), Column.from_pylist(sku, String),
         Column.from_numpy(amount), Column.from_numpy(qty)]))
    return c, region, sku, amount, qty


def test_agg_index_answers_matching_query(ai_ctx):
    c, region, sku, amount, qty = ai_ctx
    q = ("SELECT region, sku, count(*), sum(amount), min(amount),"
         " max(amount), avg(qty) FROM sales GROUP BY region, sku"
         " ORDER BY region, sku")
    expected = c.sql(q).rows()
    c.sql("CREATE AGGREGATING INDEX sales_agg AS SELECT region, sku,"
          " count(*), sum(amount), min(amount), max(amount), avg(qty)"
          " FROM sales GROUP BY region, sku")
    before = METRICS.snapshot().get("agg_index_scans", 0)
    got = c.sql(q).rows()
    assert METRICS.snapshot().get("agg_index_scans", 0) == before + 1
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:3] == e[:3]
        for a, b in zip(g[3:], e[3:]):
            assert a == pytest.approx(b, rel=1e-9)


def test_agg_index_subset_and_key_order(ai_ctx):
    c, *_ = ai_ctx
    c.sql("CREATE AGGREGATING INDEX s2 AS SELECT region, sku, count(*),"
          " sum(amount) FROM sales GROUP BY region, sku")
    # different key order + subset of aggregates still matches
    before = METRICS.snapshot().get("agg_index_scans", 0)
    r = c.sql("SELECT sku, region, sum(amount) FROM sales GROUP BY sku,"
              " region ORDER BY sku, region").rows()
    assert METRICS.snapshot().get("agg_index_scans", 0) == before + 1
    assert len(r) == 28  # 4 skus x 7 regions


def test_agg_index_covers_new_writes(ai_ctx):
    c, *_ = ai_ctx
    c.sql("CREATE AGGREGATING INDEX s3 AS SELECT region, sum(qty)"
          " FROM sales GROUP BY region")
    r0 = c.sql("SELECT region, sum(qty) FROM sales GROUP BY region"
               " ORDER BY region").rows()
    # new INSERT builds the sidecar at write; answers stay exact
    c.sql("INSERT INTO sales VALUES (0, 'sku0', 1.0, 100)")
    before = METRICS.snapshot().get("agg_index_scans", 0)
    r1 = c.sql("SELECT region, sum(qty) FROM sales GROUP BY region"
               " ORDER BY region").rows()
    assert METRICS.snapshot().get("agg_index_scans", 0) == before + 1
    assert r1[0][1] == r0[0][1] + 100


def test_agg_index_no_match_falls_back(ai_ctx):
    c, region, sku, amount, qty = ai_ctx
    c.sql("CREATE AGGREGATING INDEX s4 AS SELECT region, sum(amount)"
          " FROM sales GROUP BY region")
    before = METRICS.snapshot().get("agg_index_scans", 0)
    # filter present -> not answerable from the index
    r = c.sql("SELECT region, sum(amount) FROM sales WHERE qty > 5"
              " GROUP BY region ORDER BY region").rows()
    # different keys -> not answerable
    c.sql("SELECT sku, sum(amount) FROM sales GROUP BY sku")
    assert METRICS.snapshot().get("agg_index_scans", 0) == before
    assert len(r) == 7


def test_agg_index_ddl_validation(ai_ctx):
    c, *_ = ai_ctx
    with pytest.raises(SemanticError):
        c.sql("CREATE AGGREGATING INDEX bad1 AS SELECT amount FROM sales")
    with pytest.raises(SemanticError):
        c.sql("CREATE AGGREGATING INDEX bad2 AS SELECT region, median(amount)"
              " FROM sales GROUP BY region")
    with pytest.raises(SemanticError):
        c.sql("CREATE AGGREGATING INDEX bad3 AS SELECT region, sum(amount)"
              " FROM sales WHERE qty > 2 GROUP BY region")


def test_agg_index_drop_and_refresh(ai_ctx):
    c, *_ = ai_ctx
    c.sql("CREATE AGGREGATING INDEX s5 ASYNC AS SELECT region, count(*)"
          " FROM sales GROUP BY region")
    before = METRICS.snapshot().get("agg_index_scans", 0)
    c.sql("SELECT region, count(*) FROM sales GROUP BY region")
    # ASYNC: sidecars not built yet -> falls back
    assert METRICS.snapshot().get("agg_index_scans", 0) == before
    c.sql("REFRESH AGGREGATING INDEX s5 ON sales")
    c.sql("SELECT region, count(*) FROM sales GROUP BY region")
    assert METRICS.snapshot().get("agg_index_scans", 0) == before + 1
    c.sql("DROP AGGREGATING INDEX s5 ON sales")
    rows = c.sql("SELECT name FROM system.indexes WHERE name = 's5'").rows()
    assert rows == []


def test_agg_index_plan_level_rewrite(ai_ctx):
    """VERDICT r2 item 6 done-criteria: EXPLAIN shows the index-only
    scan, and the query completes with ZERO data-block reads."""
    c, region, sku, amount, qty = ai_ctx
    c.sql("CREATE AGGREGATING INDEX sales_agg2 AS SELECT region,"
          " count(*), sum(amount) FROM sales GROUP BY region")
    q = "SELECT region, count(*), sum(amount) FROM sales GROUP BY region"
    lines = [r[0] for r in c.sql("EXPLAIN " + q).rows()]
    joined = "\n".join(lines)
    assert "from_index=sales_agg2 (index-only scan)" in joined, joined

    # zero data-block reads: poison the data-block reader for the scan
    table = c.table("sales")
    import databend_tpu.storage.fuse.table as ft

    real = type(table).read_block

    def poisoned(self, meta, needed=None):
        raise AssertionError("data block read during index-only aggregate")

    type(table).read_block = poisoned
    try:
        got = c.sql(q).rows()
    finally:
        type(table).read_block = real
    want = {}
    for r, a in zip(region, amount):
        want.setdefault(int(r), [0, 0.0])
        want[int(r)][0] += 1
        want[int(r)][1] += float(a)
    for row in got:
        assert row[1] == want[int(row[0])][0]
        assert abs(row[2] - want[int(row[0])][1]) < 1e-6
