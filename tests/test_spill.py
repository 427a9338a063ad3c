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
