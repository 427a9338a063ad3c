"""Raft-replicated meta service: election, replication, failover,
restart catch-up (reference: the 3-replica databend-meta deployment;
Cargo.toml:170)."""

import socket
import time

import pytest

from databend_tpu.meta.kv import RemoteMetaStore


def _free_ports(n):
    socks = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _wait_leader(stores, timeout=10.0):
    """Poll node statuses until exactly one leader emerges; returns its
    node index."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        leaders = []
        for i, st in enumerate(stores):
            try:
                s = st.status()
            except Exception:
                continue
            if s.get("role") == "leader":
                leaders.append(i)
        if len(leaders) == 1:
            return leaders[0]
        time.sleep(0.1)
    raise AssertionError("no single raft leader elected")


@pytest.fixture
def cluster(tmp_path):
    from databend_tpu.meta.server import serve
    ports = _free_ports(3)
    peers = {f"n{i+1}": f"127.0.0.1:{p}" for i, p in enumerate(ports)}
    servers = {}

    def boot(i):
        servers[i] = serve(
            ports[i], str(tmp_path / f"meta{i}.db"), in_thread=True,
            raft_id=f"n{i+1}", raft_peers=peers,
            election_timeout=(0.25, 0.5), heartbeat=0.08)

    for i in range(3):
        boot(i)
    yield ports, servers, boot, tmp_path
    for h in servers.values():
        try:
            h.meta_service.close()
            h.shutdown()
        except Exception:
            pass


def _stop(servers, i):
    servers[i].meta_service.close()
    servers[i].shutdown()
    servers[i].server_close()
    del servers[i]


def test_raft_election_replication_failover(cluster):
    ports, servers, boot, tmp = cluster
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    leader = _wait_leader(stores)

    # write through a FOLLOWER endpoint: 421 redirect to the leader
    follower = (leader + 1) % 3
    seq = stores[follower].upsert("app/x", {"v": 1})
    assert seq == 1
    val, s = stores[follower].get("app/x")
    assert val == {"v": 1} and s == 1

    # CAS conflict surfaces as TableVersionMismatched through raft
    from databend_tpu.errors import TableVersionMismatched
    with pytest.raises(TableVersionMismatched):
        stores[follower].upsert("app/x", {"v": 2}, expected_seq=99)
    assert stores[follower].upsert("app/x", {"v": 2}, expected_seq=1) == 2

    # id allocation replicates
    assert stores[follower].next_id("tbl") == 1
    assert stores[follower].next_id("tbl") == 2

    # ---- kill the leader: a new one takes over with the data intact
    _stop(servers, leader)
    time.sleep(0.3)
    # fresh per-node clients: the follower store sticky-redirected its
    # endpoint to the (now dead) leader
    alive = [RemoteMetaStore(e, timeout=2.0)
             for i, e in enumerate(eps) if i != leader]
    new_leader_pos = _wait_leader(alive)
    client = RemoteMetaStore(",".join(e for i, e in enumerate(eps)
                                      if i != leader), timeout=2.0)
    val, s = client.get("app/x")
    assert val == {"v": 2} and s == 2
    assert client.upsert("post/failover", 42) == 1
    assert client.next_id("tbl") == 3

    # ---- restart the killed node: it catches up from its log + leader
    boot(leader)
    time.sleep(1.5)
    st = RemoteMetaStore(eps[leader], timeout=2.0).status()
    assert st["raft"]["last_applied"] >= 1
    # and the restarted follower redirects writes to the live leader
    assert RemoteMetaStore(",".join(eps), timeout=2.0).get(
        "post/failover")[0] == 42


def test_raft_minority_cannot_commit(tmp_path):
    # a single node of a 3-peer cluster must not elect itself or accept
    # writes (no majority)
    from databend_tpu.meta.server import serve
    ports = _free_ports(3)
    peers = {f"n{i+1}": f"127.0.0.1:{p}" for i, p in enumerate(ports)}
    h = serve(ports[0], None, in_thread=True, raft_id="n1",
              raft_peers=peers, election_timeout=(0.2, 0.35),
              heartbeat=0.08)
    try:
        st = RemoteMetaStore(f"http://127.0.0.1:{ports[0]}", timeout=1.0)
        time.sleep(1.2)
        assert st.status()["role"] != "leader"
        with pytest.raises(RuntimeError):
            st.upsert("k", 1)
    finally:
        h.meta_service.close()
        h.shutdown()
        h.server_close()


@pytest.fixture
def compact_cluster(tmp_path):
    """3-node raft cluster with an aggressive compaction threshold."""
    from databend_tpu.meta.server import serve
    ports = _free_ports(3)
    peers = {f"n{i+1}": f"127.0.0.1:{p}" for i, p in enumerate(ports)}
    servers = {}

    def boot(i, fresh=False):
        path = tmp_path / f"meta{i}.db"
        if fresh and (tmp_path / f"meta{i}.db.raftlog").exists():
            (tmp_path / f"meta{i}.db.raftlog").unlink()
        servers[i] = serve(
            ports[i], str(path), in_thread=True,
            raft_id=f"n{i+1}", raft_peers=peers,
            election_timeout=(0.25, 0.5), heartbeat=0.08,
            compact_threshold=20)

    for i in range(3):
        boot(i)
    yield ports, servers, boot
    for h in servers.values():
        try:
            h.meta_service.close()
            h.shutdown()
        except Exception:
            pass


def test_raft_log_compaction_and_snapshot_install(compact_cluster):
    """Log compaction: the leader snapshots + truncates once the applied
    log exceeds the threshold; a follower that lost its disk catches up
    through InstallSnapshot, not full log replay (reference: openraft
    snapshot replication, Cargo.toml:170)."""
    ports, servers, boot = compact_cluster
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    leader = _wait_leader(stores)
    client = RemoteMetaStore(",".join(eps), timeout=2.0)

    for i in range(60):
        client.upsert(f"k/{i:03d}", {"v": i})
    # leader compacted: snapshot taken, log prefix dropped
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        st = stores[leader].status()["raft"]
        if st["snap_index"] >= 20:
            break
        time.sleep(0.1)
    st = stores[leader].status()["raft"]
    assert st["snap_index"] >= 20
    assert st["log_len"] - st["snap_index"] < 60

    # follower loses its disk entirely; more writes land past the
    # compaction horizon while it is down
    victim = (leader + 1) % 3
    _stop(servers, victim)
    for i in range(60, 120):
        client.upsert(f"k/{i:03d}", {"v": i})
    boot(victim, fresh=True)
    deadline = time.monotonic() + 8
    caught_up = False
    while time.monotonic() < deadline:
        try:
            st = RemoteMetaStore(eps[victim], timeout=1.0).status()["raft"]
        except Exception:
            time.sleep(0.2)
            continue
        if st["snap_index"] >= 20 and st["last_applied"] >= 120:
            caught_up = True
            break
        time.sleep(0.1)
    assert caught_up, "fresh follower did not install the snapshot"

    # the restored follower can win an election and serve ALL data
    _stop(servers, leader)
    survivors = [i for i in range(3) if i in servers]
    alive = [RemoteMetaStore(eps[i], timeout=2.0) for i in survivors]
    _wait_leader(alive)
    c2 = RemoteMetaStore(",".join(eps[i] for i in survivors), timeout=2.0)
    assert c2.get("k/000")[0] == {"v": 0}
    assert c2.get("k/119")[0] == {"v": 119}


def test_raft_restart_from_snapshot(compact_cluster):
    """A node restarting with its own log restores the snapshot state
    first, then replays only the retained tail (no double-apply of the
    id allocator: the state machine is rebuilt, not re-mutated)."""
    ports, servers, boot = compact_cluster
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    leader = _wait_leader(stores)
    client = RemoteMetaStore(",".join(eps), timeout=2.0)
    for i in range(50):
        client.upsert(f"r/{i:02d}", i)
    ids = [client.next_id("ctr") for _ in range(5)]
    assert ids == [1, 2, 3, 4, 5]

    # restart every node (full-cluster power cycle)
    for i in range(3):
        _stop(servers, i)
    for i in range(3):
        boot(i)
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    _wait_leader(stores)
    c2 = RemoteMetaStore(",".join(eps), timeout=2.0)
    assert c2.get("r/00")[0] == 0
    assert c2.get("r/49")[0] == 49
    # id allocator continues exactly where it left off
    assert c2.next_id("ctr") == 6


def test_raft_linearizable_reads_under_leader_kill(compact_cluster):
    """Kill-leader-under-load: every acknowledged write is visible to the
    very next read (read-index / leader-lease reads; a deposed leader
    answers NotLeader, never stale data)."""
    ports, servers, boot = compact_cluster
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    leader = _wait_leader(stores)
    client = RemoteMetaStore(",".join(eps), timeout=3.0)

    acked = 0
    killed = False
    for i in range(1, 41):
        if i == 15:
            _stop(servers, leader)
            killed = True
        try:
            client.upsert("cnt", i)
            acked = i
        except Exception:
            time.sleep(0.3)  # election window: the write may have failed
        try:
            val, _ = client.get("cnt")
        except Exception:
            time.sleep(0.3)
            continue
        # linearizability: a read NEVER precedes the last acked write
        assert val is not None and val >= acked, \
            f"stale read {val} after ack {acked}"
    assert killed and acked >= 15


def test_raft_membership_change(cluster):
    """Dynamic membership (reference: databend-meta member join/leave):
    the leader adds a 4th voter at runtime; the joiner catches up via
    log replication / snapshot install; killing the OLD leader still
    leaves a committable majority including the new member."""
    import json
    import urllib.request

    from databend_tpu.meta.server import serve
    ports, servers, boot, tmp = cluster
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    stores = [RemoteMetaStore(e, timeout=2.0) for e in eps]
    leader = _wait_leader(stores)
    for i in range(5):
        stores[leader].upsert(f"pre/{i}", i)

    # boot the joiner with only itself + the leader as contact points
    (new_port,) = _free_ports(1)
    new_ep = f"127.0.0.1:{new_port}"
    joiner = serve(new_port, str(tmp / "meta_new.db"), in_thread=True,
                   raft_id="n4", raft_peers={"n4": new_ep},
                   raft_learner=True,
                   election_timeout=(0.25, 0.5), heartbeat=0.08)
    try:
        req = urllib.request.Request(
            f"{eps[leader]}/v1/raft/add_voter",
            data=json.dumps({"id": "n4", "endpoint": new_ep}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5.0) as r:
            assert json.loads(r.read())["ok"]

        # the joiner replicates the existing data
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            try:
                if RemoteMetaStore(f"http://{new_ep}",
                                   timeout=2.0).get("pre/4")[0] == 4:
                    break
            except Exception:
                pass
            time.sleep(0.1)
        else:
            raise AssertionError("joiner did not catch up")

        # kill the OLD leader: {3 of 4} still commits, joiner included
        _stop(servers, leader)
        time.sleep(0.3)
        rest = [e for i, e in enumerate(eps) if i != leader] \
            + [f"http://{new_ep}"]
        client = RemoteMetaStore(",".join(rest), timeout=2.0)
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            try:
                assert client.upsert("post/join", 7) >= 1
                break
            except Exception:
                time.sleep(0.2)
        else:
            raise AssertionError("no quorum after old leader killed")
        assert client.get("post/join")[0] == 7
    finally:
        try:
            joiner.meta_service.close()
            joiner.shutdown()
            joiner.server_close()
        except Exception:
            pass
