"""Concurrency stress — the race-detection analog.

The reference leans on Rust + Miri for data-race safety (Makefile:69
`make miri`); a Python engine can't run Miri, so the equivalent
discipline is an adversarial concurrency suite: hammer the shared
structures (meta KV, OCC snapshot commit, caches, session registry)
from many threads and assert the invariants that a race would break —
lost updates, torn snapshots, deadlocks (enforced by the suite's own
wall-clock bound), and double-applied commits.
"""

import threading
import time

import numpy as np
import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import Column, DataBlock


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "data")


def _run_threads(workers, timeout=90):
    threads = [threading.Thread(target=w, daemon=True) for w in workers]
    for t in threads:
        t.start()
    deadline = time.time() + timeout
    for t in threads:
        t.join(max(0.1, deadline - time.time()))
    assert not any(t.is_alive() for t in threads), \
        "deadlock/stall: worker thread still alive at the suite bound"


def test_concurrent_appends_no_lost_updates(root):
    """N writer threads x M single-block INSERTs through OCC commit:
    every committed block must survive (a lost CAS retry would drop
    rows)."""
    ctx = SessionContext(data_root=root)
    ctx.sql("CREATE TABLE occ (w BIGINT, i BIGINT)")
    n_threads, per = 4, 12
    errors = []

    def writer(wid):
        def go():
            s = SessionContext(data_root=root)
            try:
                for i in range(per):
                    s.sql(f"INSERT INTO occ VALUES ({wid}, {i})")
            except Exception as e:  # pragma: no cover
                errors.append(e)
        return go

    _run_threads([writer(w) for w in range(n_threads)])
    assert not errors, errors[:3]
    out = ctx.sql("SELECT count(*), count(DISTINCT w) FROM occ").rows()[0]
    assert out[0] == n_threads * per and out[1] == n_threads
    # per-writer counts intact (no torn/duplicated commits)
    per_w = dict(ctx.sql("SELECT w, count(*) FROM occ GROUP BY w").rows())
    assert all(per_w[w] == per for w in range(n_threads))


def test_concurrent_readers_see_consistent_snapshots(root):
    """Readers racing a writer must always see a whole number of
    committed batches (snapshot isolation at block granularity —
    a torn read would yield a partial batch)."""
    ctx = SessionContext(data_root=root)
    ctx.sql("CREATE TABLE snapiso (v BIGINT)")
    batch = 500
    stop = threading.Event()
    bad, errors = [], []

    def writer():
        try:
            s = SessionContext(data_root=root)
            for i in range(10):
                s.insert_block("snapiso", DataBlock(
                    ["v"], [Column.from_numpy(
                        np.full(batch, i, np.int64))], batch))
        finally:
            stop.set()

    def reader():
        s = SessionContext(data_root=root)
        while not stop.is_set():
            try:
                n = s.sql("SELECT count(*) FROM snapiso").rows()[0][0]
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            if n % batch != 0:
                bad.append(n)
                return

    _run_threads([writer] + [reader] * 3)
    assert not errors, errors[:3]
    assert not bad, f"torn read: saw row counts {bad[:5]}"
    ctx2 = SessionContext(data_root=root)
    assert ctx2.sql("SELECT count(*) FROM snapiso").rows()[0][0] == 5000


def test_concurrent_ddl_and_meta(root):
    """Parallel CREATE/DROP of distinct tables + settings churn on the
    shared meta KV: no cross-talk, catalog stays consistent."""
    errors = []

    def ddl(wid):
        def go():
            try:
                s = SessionContext(data_root=root)
                for i in range(8):
                    s.sql(f"CREATE TABLE ddl_{wid}_{i} (a BIGINT)")
                    s.sql(f"INSERT INTO ddl_{wid}_{i} VALUES ({wid})")
                    assert s.sql(f"SELECT a FROM ddl_{wid}_{i}"
                                 ).rows() == [(wid,)]
                    if i % 2:
                        s.sql(f"DROP TABLE ddl_{wid}_{i}")
            except Exception as e:  # pragma: no cover
                errors.append(e)
        return go

    _run_threads([ddl(w) for w in range(4)])
    assert not errors, errors[:3]
    s = SessionContext(data_root=root)
    names = {r[0] for r in s.sql(
        "SELECT name FROM system.tables WHERE database = 'default'").rows()}
    for w in range(4):
        for i in range(8):
            expect = (i % 2) == 0
            assert ((f"ddl_{w}_{i}" in names) == expect), (w, i)


def test_kill_query_under_load(root):
    """KILL QUERY from another thread interrupts a long scan without
    poisoning the session (failure-detection path under concurrency)."""
    ctx = SessionContext(data_root=root)
    ctx.sql("CREATE TABLE big (v DOUBLE)")
    rng = np.random.default_rng(0)
    for _ in range(4):
        ctx.insert_block("big", DataBlock(
            ["v"], [Column.from_numpy(rng.random(200_000))], 200_000))
    from databend_tpu.utils import processes
    got = {}

    def victim():
        s = SessionContext(data_root=root)
        try:
            # a cross join big enough to outlive the killer
            s.sql("SELECT count(*) FROM big a, big b WHERE a.v + b.v > 3")
            got["done"] = True
        except Exception as e:
            got["err"] = type(e).__name__

    def killer():
        for _ in range(400):
            target = [p for p in processes.list_running()
                      if "count(*)" in (p["sql"] or "")]
            if target:
                processes.kill(target[0]["id"])
                return
            time.sleep(0.05)

    _run_threads([victim, killer], timeout=120)
    # either the kill landed (exception) or the query finished first —
    # both are consistent outcomes; a hang would have tripped the bound
    assert got, "victim thread produced no outcome"
