"""Regression tests for round-2 advisor findings (ADVICE.md):

1. Stage path traversal: @stage/../.. must not escape the stage root.
2. Join runtime filter: NaN build keys must not empty the join.
3. Correlated NOT IN keeps three-valued semantics (null-aware anti join).
4. REPLACE INTO conflicts match by typed values, null-safe.
5. ROLLBACK restores tables dropped inside the transaction.
"""

import numpy as np
import pytest

from databend_tpu.errors import BadArguments


def test_stage_traversal_rejected(tmp_catalog):
    ctx = tmp_catalog
    with pytest.raises(BadArguments):
        ctx.sql("LIST @~/../../..")
    with pytest.raises(BadArguments):
        ctx.sql("REMOVE @~/../../../etc")
    ctx.sql("CREATE STAGE trav")
    with pytest.raises(BadArguments):
        ctx.stages.put_bytes("@trav", "../evil.txt", b"x")
    # benign inner '..' that stays under the root is fine
    ctx.stages.put_bytes("@trav", "a/../b.csv", b"1\n")
    files = ctx.stages.list_files("@trav")
    assert [f[0] for f in files] == ["b.csv"]


def test_runtime_filter_nan_build_key(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE TABLE facts (k DOUBLE, v INT)")
    ctx.sql("CREATE TABLE dims (k DOUBLE)")
    ctx.sql("INSERT INTO facts VALUES (1.0, 10), (2.0, 20), (3.0, 30)")
    # build side carries a NaN key: min/max would be NaN and the pushed
    # range filter would drop every probe row
    ctx.sql("INSERT INTO dims VALUES (2.0), (sqrt(-1.0))")
    r = ctx.sql("SELECT facts.v FROM facts JOIN dims ON facts.k = dims.k")
    assert r.to_pydict()["v"] == [20]


def test_correlated_not_in_three_valued(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE TABLE o3 (k INT, x INT NULL)")
    ctx.sql("CREATE TABLE i3 (k INT, v INT NULL)")
    ctx.sql("INSERT INTO o3 VALUES (1, 10), (1, 99), (2, 5), (3, NULL), (4, 7)")
    ctx.sql("INSERT INTO i3 VALUES (1, 10), (1, NULL), (2, 6), (3, 1)")
    # k=1 x=10: matches -> filtered. k=1 x=99: inner has NULL -> UNKNOWN
    # -> filtered. k=2 x=5: no match, no NULLs -> kept. k=3 x=NULL with
    # non-empty inner -> UNKNOWN -> filtered. k=4: empty inner -> kept.
    r = ctx.sql("SELECT o3.k, o3.x FROM o3 WHERE o3.x NOT IN "
                "(SELECT i3.v FROM i3 WHERE i3.k = o3.k) ORDER BY o3.k")
    d = r.to_pydict()
    assert d["k"] == [2, 4]
    assert d["x"] == [5, 7]


def test_replace_into_typed_and_null_keys(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE TABLE rep (k DOUBLE NULL, v VARCHAR)")
    ctx.sql("INSERT INTO rep VALUES (1.5, 'a'), (NULL, 'b'), (2.0, 'c')")
    # float key 1.5 must match the existing 1.5 typed, not via str();
    # NULL key must replace the existing NULL-key row, not duplicate it
    ctx.sql("REPLACE INTO rep ON (k) VALUES (1.5, 'A'), (NULL, 'B')")
    r = ctx.sql("SELECT v FROM rep ORDER BY v")
    assert r.to_pydict()["v"] == ["A", "B", "c"]


def test_rollback_restores_dropped_table(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE TABLE txn_t (a INT)")
    ctx.sql("INSERT INTO txn_t VALUES (1), (2)")
    ctx.sql("BEGIN")
    ctx.sql("DROP TABLE txn_t")
    ctx.sql("ROLLBACK")
    r = ctx.sql("SELECT a FROM txn_t ORDER BY a")
    assert r.to_pydict()["a"] == [1, 2]
