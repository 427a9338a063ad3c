"""REPLACE INTO (upsert on conflict keys).

Reference: replace-into interpreter + bloom-pruned conflict detection.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_replace_values(ctx):
    ctx.sql("CREATE TABLE t (k INT, v VARCHAR)")
    ctx.sql("REPLACE INTO t ON (k) VALUES (1, 'a'), (2, 'b')")
    ctx.sql("REPLACE INTO t ON (k) VALUES (2, 'B2'), (3, 'c')")
    assert ctx.sql("SELECT k, v FROM t ORDER BY k").rows() == \
        [(1, "a"), (2, "B2"), (3, "c")]


def test_replace_from_select(ctx):
    ctx.sql("CREATE TABLE t (k INT, v VARCHAR)")
    ctx.sql("INSERT INTO t VALUES (1, 'old')")
    ctx.sql("CREATE TABLE src (k INT, v VARCHAR)")
    ctx.sql("INSERT INTO src VALUES (1, 'new'), (2, 'two')")
    r = ctx.sql("REPLACE INTO t ON (k) SELECT k, v FROM src")
    assert r.affected_rows == 2
    assert ctx.sql("SELECT k, v FROM t ORDER BY k").rows() == \
        [(1, "new"), (2, "two")]


def test_replace_composite_keys(ctx):
    ctx.sql("CREATE TABLE m (a INT, b VARCHAR, x INT)")
    ctx.sql("REPLACE INTO m ON (a, b) VALUES (1, 'p', 10), (1, 'q', 20)")
    ctx.sql("REPLACE INTO m ON (a, b) VALUES (1, 'p', 99)")
    assert ctx.sql("SELECT a, b, x FROM m ORDER BY b").rows() == \
        [(1, "p", 99), (1, "q", 20)]


def test_replace_unknown_key_errors(ctx):
    ctx.sql("CREATE TABLE t2 (k INT)")
    with pytest.raises(Exception):
        ctx.sql("REPLACE INTO t2 ON (nope) VALUES (1)")
