"""Cluster membership + distributed coordination over the meta KV
(reference: clusters/cluster.rs registry/heartbeat; meta plugins lock/
semaphore). The sqlite meta store (WAL) is the raft-group stand-in."""

import os
import subprocess
import sys
import textwrap
import time

import pytest

from databend_tpu.meta.cluster import (ClusterDiscovery, DistributedLock,
                                       DistributedSemaphore, NodeInfo)
from databend_tpu.meta.kv import MetaStore


@pytest.fixture
def meta(tmp_path):
    m = MetaStore(str(tmp_path / "meta.db"))
    yield m
    m.close()


def test_register_heartbeat_expire(meta):
    d = ClusterDiscovery(meta, ttl_secs=0.15)
    n1 = NodeInfo("n1", "http://h1:8124")
    n2 = NodeInfo("n2", "http://h2:8124")
    d.register(n1)
    d.register(n2)
    assert [n.node_id for n in d.list_nodes()] == ["n1", "n2"]
    time.sleep(0.2)
    # both leases expired; heartbeat revives only n1
    assert d.list_nodes() == []
    assert d.heartbeat("n1")
    assert [n.node_id for n in d.list_nodes()] == ["n1"]
    d.unregister("n1")
    assert d.list_nodes() == []
    assert not d.heartbeat("n1")  # gone: must re-register


def test_registry_visible_across_processes(meta, tmp_path):
    """A second PROCESS registers via the shared sqlite store."""
    d = ClusterDiscovery(meta)
    d.register(NodeInfo("parent", "http://p:1"))
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {os.getcwd()!r})
        from databend_tpu.meta.kv import MetaStore
        from databend_tpu.meta.cluster import ClusterDiscovery, NodeInfo
        m = MetaStore({str(tmp_path / 'meta.db')!r})
        ClusterDiscovery(m).register(NodeInfo("child", "http://c:2"))
        m.close()
    """)
    subprocess.run([sys.executable, "-c", script], check=True,
                   env={**os.environ, "JAX_PLATFORMS": "cpu"})
    names = [n.node_id for n in d.list_nodes()]
    assert names == ["child", "parent"]


def test_distributed_lock_mutual_exclusion(meta):
    l1 = DistributedLock(meta, "tbl/42", owner="a")
    l2 = DistributedLock(meta, "tbl/42", owner="b")
    assert l1.try_acquire()
    assert not l2.try_acquire()
    assert l1.try_acquire()  # re-entrant for the same owner
    l1.release()
    assert l2.try_acquire()
    l2.release()


def test_distributed_lock_lease_expiry(meta):
    l1 = DistributedLock(meta, "t", owner="a", ttl_secs=0.1)
    l2 = DistributedLock(meta, "t", owner="b", ttl_secs=0.1)
    assert l1.try_acquire()
    time.sleep(0.15)
    assert l2.try_acquire()  # expired lease is claimable


def test_semaphore_permits(meta):
    s = DistributedSemaphore(meta, "scan", permits=2)
    t1 = s.try_acquire()
    t2 = s.try_acquire()
    assert t1 and t2
    assert s.try_acquire() is None
    s.release(t1)
    t3 = s.try_acquire()
    assert t3
    s.release(t2)
    s.release(t3)


def test_system_clusters_shows_registered_node(tmp_catalog):
    c = tmp_catalog
    from databend_tpu.meta.cluster import ClusterDiscovery, NodeInfo
    ClusterDiscovery(c.meta).register(NodeInfo("srv-1", "http://x:8124"))
    rows = c.sql("SELECT name FROM system.clusters").rows()
    names = [r[0] for r in rows]
    assert "srv-1" in names
