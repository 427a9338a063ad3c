"""RANGE frames with value offsets (reference: window frame bounds)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def wr_ctx(tmp_catalog, rng):
    c = tmp_catalog
    c.sql("CREATE TABLE wr (g BIGINT, k DOUBLE, v DOUBLE)")
    from databend_tpu.expression import Column, DataBlock
    n = 300
    g = (np.arange(n) % 3).astype(np.int64)
    k = np.round(rng.uniform(0, 50, n), 1)
    v = rng.standard_normal(n)
    c.insert_block("wr", DataBlock(
        ["g", "k", "v"],
        [Column.from_numpy(g), Column.from_numpy(k), Column.from_numpy(v)]))
    return c, pd.DataFrame({"g": g, "k": k, "v": v})


def _pandas_range_agg(df, a, b, agg, asc=True):
    """Ground truth: per row, agg(v) over rows in the same g with
    k in [k_i + a, k_i + b] (value offsets; a/b None = unbounded)."""
    out = np.empty(len(df))
    for gi, sub in df.groupby("g"):
        for idx, row in sub.iterrows():
            lo = -np.inf if a is None else row.k + a
            hi = np.inf if b is None else row.k + b
            win = sub[(sub.k >= lo) & (sub.k <= hi)].v
            out[idx] = getattr(win, agg)()
    return out


@pytest.mark.parametrize("agg", ["sum", "min", "max", "count", "avg"])
def test_range_frame_offsets(wr_ctx, agg):
    c, df = wr_ctx
    sql_agg = f"{agg}(v)" if agg != "count" else "count(*)"
    rows = c.sql(
        f"SELECT g, k, {sql_agg} OVER (PARTITION BY g ORDER BY k"
        f" RANGE BETWEEN 2.5 PRECEDING AND 2.5 FOLLOWING) FROM wr"
        " ORDER BY g, k").rows()
    dfs = df.sort_values(["g", "k"], kind="stable").reset_index(drop=True)
    want = _pandas_range_agg(dfs, -2.5, 2.5, agg if agg != "avg" else "mean")
    for (gi, ki, got), w in zip(rows, want):
        if agg == "count":
            assert got == int(w), (gi, ki)
        else:
            assert got == pytest.approx(w, rel=1e-9), (gi, ki)


def test_range_frame_unbounded_preceding(wr_ctx):
    c, df = wr_ctx
    rows = c.sql(
        "SELECT g, k, sum(v) OVER (PARTITION BY g ORDER BY k"
        " RANGE BETWEEN UNBOUNDED PRECEDING AND 1.0 FOLLOWING) FROM wr"
        " ORDER BY g, k").rows()
    dfs = df.sort_values(["g", "k"], kind="stable").reset_index(drop=True)
    want = _pandas_range_agg(dfs, None, 1.0, "sum")
    for (gi, ki, got), w in zip(rows, want):
        assert got == pytest.approx(w, rel=1e-9)


def test_range_frame_desc_order(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE wd (k BIGINT)")
    c.sql("INSERT INTO wd VALUES (1), (2), (3), (5), (8)")
    rows = c.sql(
        "SELECT k, count(*) OVER (ORDER BY k DESC"
        " RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) FROM wd"
        " ORDER BY k").rows()
    # DESC: PRECEDING means larger k; window = k' in [k, k+2]
    want = {1: 3, 2: 2, 3: 2, 5: 1, 8: 1}
    for k, cnt in rows:
        assert cnt == want[k], k


def test_range_frame_peers_at_current_row(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE wp (k BIGINT, v BIGINT)")
    c.sql("INSERT INTO wp VALUES (1, 10), (1, 20), (2, 1)")
    rows = c.sql(
        "SELECT k, sum(v) OVER (ORDER BY k"
        " RANGE BETWEEN CURRENT ROW AND CURRENT ROW) FROM wp"
        " ORDER BY k, v").rows()
    # RANGE CURRENT ROW includes peers (same key value)
    assert [tuple(r) for r in rows] == [(1, 30), (1, 30), (2, 1)]


def test_range_frame_requires_single_numeric_key(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE we (a BIGINT, b BIGINT, s VARCHAR)")
    c.sql("INSERT INTO we VALUES (1, 2, 'x')")
    import pytest as _pt
    from databend_tpu.errors import SemanticError
    with _pt.raises(SemanticError):
        c.sql("SELECT sum(a) OVER (ORDER BY a, b"
              " RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM we")
    with _pt.raises(SemanticError):
        c.sql("SELECT sum(a) OVER (ORDER BY s"
              " RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM we")
