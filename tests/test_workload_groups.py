"""Workload groups: quota bundles attached to warehouses.

Reference: ee resource_management + runtime workload groups — admission
(max_concurrency), memory quota (caps MemStat), query timeout.
"""

import threading
import time

import pytest


@pytest.fixture()
def ctx(tmp_path):
    from databend_tpu import SessionContext
    return SessionContext(data_root=str(tmp_path / "e"))


def test_workload_group_crud(ctx):
    ctx.sql("CREATE WORKLOAD GROUP g1 WITH max_concurrency = 2,"
            " memory_quota = '64MB', query_timeout = 30")
    rows = ctx.sql("SHOW WORKLOAD GROUPS").rows()
    assert rows[0][0] == "g1" and rows[0][1] == "2"
    ctx.sql("ALTER WORKLOAD GROUP g1 SET max_concurrency = 5")
    rows = ctx.sql("SELECT name, max_concurrency FROM"
                   " system.workload_groups").rows()
    assert rows == [("g1", "5")]
    with pytest.raises(Exception, match="already exists"):
        ctx.sql("CREATE WORKLOAD GROUP g1")
    with pytest.raises(Exception, match="unknown workload group option"):
        ctx.sql("CREATE WORKLOAD GROUP g2 WITH bogus = 1")
    ctx.sql("DROP WORKLOAD GROUP g1")
    assert ctx.sql("SHOW WORKLOAD GROUPS").rows() == []
    ctx.sql("DROP WORKLOAD GROUP IF EXISTS g1")


def test_memory_quota_enforced(ctx):
    ctx.sql("CREATE WORKLOAD GROUP tiny WITH memory_quota = '1KB'")
    ctx.sql("CREATE WAREHOUSE w1 WITH workload_group = 'tiny'")
    ctx.sql("CREATE TABLE big (x BIGINT)")
    ctx.sql("INSERT INTO big SELECT number FROM numbers(100000)")
    # without the warehouse: fine (sort buffers charge the MemStat)
    assert ctx.sql("SELECT x FROM big ORDER BY x LIMIT 1"
                   ).rows() == [(0,)]
    ctx.sql("USE WAREHOUSE w1")
    with pytest.raises(Exception, match="memory|Memory"):
        ctx.sql("SELECT x FROM big ORDER BY x LIMIT 1")


def test_query_timeout_enforced(ctx):
    ctx.sql("CREATE WORKLOAD GROUP fast WITH query_timeout = '0.05'")
    ctx.sql("CREATE WAREHOUSE w2 WITH workload_group = 'fast'")
    ctx.sql("CREATE TABLE t2 (x BIGINT)")
    for _ in range(4):          # four blocks -> four deadline polls
        ctx.sql("INSERT INTO t2 VALUES (1), (2)")
    ctx.sql("USE WAREHOUSE w2")
    with pytest.raises(Exception, match="time|Time|deadline|exceed"):
        # sleep(0.05) folds once per scanned block; 4 blocks blow the
        # 50ms group deadline deterministically
        ctx.sql("SELECT count(sleep(0.05) + x) FROM t2")


def test_concurrency_admission(ctx, tmp_path):
    ctx.sql("CREATE WORKLOAD GROUP one WITH max_concurrency = 1,"
            " queue_timeout = '0.2'")
    ctx.sql("CREATE WAREHOUSE w3 WITH workload_group = 'one'")
    ctx.sql("USE WAREHOUSE w3")
    errors = []

    def run():
        try:
            ctx.sql("SELECT sleep(0.5)")
        except Exception as e:
            errors.append(str(e))

    threads = [threading.Thread(target=run) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # with one slot and a 0.2s queue timeout, at least one waiter times out
    assert any("queue" in e.lower() for e in errors), errors


def test_workload_group_license_gated(tmp_path):
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "lic"))
    ctx.sql("SET GLOBAL enterprise_license = 'vacuum'")
    with pytest.raises(Exception, match="[Ll]icense"):
        ctx.sql("CREATE WORKLOAD GROUP g")
