"""QUALIFY, PIVOT/UNPIVOT, KILL QUERY, BEGIN/COMMIT/ROLLBACK.

Reference: query.rs (PIVOT/UNPIVOT/QUALIFY grammar), statement.rs
kill_stmt, multi-statement transactions.
"""

import threading
import time

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_qualify_basic(ctx):
    ctx.sql("CREATE TABLE e (dept VARCHAR, name VARCHAR, sal INT)")
    ctx.sql("INSERT INTO e VALUES ('a','x',10),('a','y',20),('b','z',30)")
    rows = ctx.sql("SELECT dept, name FROM e QUALIFY row_number() OVER"
                   " (PARTITION BY dept ORDER BY sal DESC) = 1"
                   " ORDER BY dept").rows()
    assert rows == [("a", "y"), ("b", "z")]


def test_qualify_alias_and_mixed(ctx):
    ctx.sql("CREATE TABLE e2 (g VARCHAR, v INT)")
    ctx.sql("INSERT INTO e2 VALUES ('a',1),('a',2),('b',3)")
    rows = ctx.sql("SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v) AS r"
                   " FROM e2 QUALIFY r = 1 AND v < 3 ORDER BY g").rows()
    assert rows == [("a", 1, 1)]


def test_pivot(ctx):
    ctx.sql("CREATE TABLE m (city VARCHAR, month VARCHAR, amount INT)")
    ctx.sql("INSERT INTO m VALUES ('ber','jan',10),('ber','feb',20),"
            "('par','jan',5),('par','feb',7),('ber','jan',1)")
    rows = ctx.sql("SELECT * FROM m PIVOT(sum(amount) FOR month IN"
                   " ('jan','feb')) ORDER BY city").rows()
    assert rows == [("ber", 11, 20), ("par", 5, 7)]
    # other aggregate kinds route through the *_if combinators
    rows = ctx.sql("SELECT * FROM m PIVOT(max(amount) FOR month IN ('jan'))"
                   " ORDER BY city").rows()
    assert rows == [("ber", 10), ("par", 5)]


def test_unpivot(ctx):
    ctx.sql("CREATE TABLE w (id INT, q1 INT, q2 INT)")
    ctx.sql("INSERT INTO w VALUES (1, 100, 200), (2, 300, 400)")
    rows = ctx.sql("SELECT id, name, value FROM w UNPIVOT(value FOR name IN"
                   " (q1, q2)) ORDER BY id, name").rows()
    assert rows == [(1, "q1", 100), (1, "q2", 200),
                    (2, "q1", 300), (2, "q2", 400)]


def test_transaction_rollback(ctx):
    ctx.sql("CREATE TABLE t (v INT)")
    ctx.sql("INSERT INTO t VALUES (1)")
    ctx.sql("BEGIN")
    ctx.sql("INSERT INTO t VALUES (2), (3)")
    ctx.sql("CREATE TABLE made_in_txn (x INT)")
    assert ctx.sql("SELECT count(*) FROM t").rows() == [(3,)]
    ctx.sql("ROLLBACK")
    assert ctx.sql("SELECT count(*) FROM t").rows() == [(1,)]
    with pytest.raises(Exception):
        ctx.sql("SELECT * FROM made_in_txn")


def test_transaction_commit(ctx):
    ctx.sql("CREATE TABLE t2 (v INT)")
    ctx.sql("START TRANSACTION")
    ctx.sql("INSERT INTO t2 VALUES (1)")
    ctx.sql("COMMIT")
    assert ctx.sql("SELECT count(*) FROM t2").rows() == [(1,)]
    with pytest.raises(Exception):
        ctx.sql("COMMIT")  # no active txn
    with pytest.raises(Exception):
        ctx.sql("ROLLBACK")


def test_kill_query(ctx):
    """KILL aborts a long scan at its next between-blocks check."""
    from databend_tpu.utils import processes as procs
    ctx.sql("CREATE TABLE big (v BIGINT) row_per_block=500")
    ctx.sql("INSERT INTO big SELECT number FROM numbers(100000)")
    errors = []
    done = []

    def victim():
        try:
            # per-row host string kernel over 200 blocks: slow, with an
            # abort checkpoint between every block
            done.append(ctx.sql(
                "SELECT count(*) FROM big WHERE"
                " editdistance(CAST(v AS VARCHAR), '1234567') > 1"))
        except Exception as e:
            errors.append(e)

    th = threading.Thread(target=victim)
    th.start()
    killed = False
    for _ in range(2000):
        if errors or done:
            break
        target = [e for e in procs.list_running()
                  if "editdistance" in e["sql"]]
        if target:
            ctx.sql(f"KILL QUERY '{target[0]['id']}'")
            killed = True
            break
        time.sleep(0.005)
    th.join(timeout=120)
    assert killed, f"victim never observed (done={bool(done)})"
    assert errors and "killed" in str(errors[0])


def test_kill_unknown_query(ctx):
    with pytest.raises(Exception):
        ctx.sql("KILL QUERY 'nonexistent'")
