"""Meta service as a PROCESS (VERDICT r2 item 4; reference: the
raft-replicated databend-meta service, src/meta/store/src/local.rs,
clusters/cluster.rs:620).

Boots one meta-service process and two query-server processes dialing it:
both register + heartbeat, DDL on node 1 is visible on node 2 (shared
catalog through the remote meta), a distributed-flag query runs, killing
node 2 expires its lease, and metactl works against the remote store.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _wait_http(url, timeout=90):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                return json.loads(r.read())
        except Exception:
            time.sleep(0.5)
    raise TimeoutError(url)


def _sql(port, sql):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/query",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert body["state"] == "Succeeded", body
    return body


def test_meta_process_two_query_nodes(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    meta_port = _free_port()
    q1_port, q2_port = _free_port(), _free_port()
    data_root = str(tmp_path / "shared")
    procs = []
    try:
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "databend_tpu.meta.server",
             "--port", str(meta_port),
             "--path", str(tmp_path / "meta.db")],
            env=env, cwd=REPO))
        _wait_http(f"http://127.0.0.1:{meta_port}/v1/status")

        common = ["--data-root", data_root,
                  "--meta-endpoint", f"http://127.0.0.1:{meta_port}",
                  "--heartbeat-secs", "0.5", "--lease-ttl-secs", "3"]
        # start sequentially: the box has one core, concurrent jax
        # imports more than double each node's startup
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "databend_tpu.service.http.server",
             "--port", str(q1_port)] + common, env=env, cwd=REPO))
        _wait_http(f"http://127.0.0.1:{q1_port}/v1/health", timeout=180)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "databend_tpu.service.http.server",
             "--port", str(q2_port)] + common, env=env, cwd=REPO))
        _wait_http(f"http://127.0.0.1:{q2_port}/v1/health", timeout=180)

        # both nodes registered through the meta process
        rows = _sql(q1_port, "SELECT count(*) FROM system.clusters"
                    " WHERE description LIKE 'server%'")["data"]
        assert int(rows[0][0]) == 2, rows

        # DDL on node 1, data visible on node 2 (shared meta catalog)
        _sql(q1_port, "CREATE TABLE mt (a INT)")
        _sql(q1_port, "INSERT INTO mt VALUES (1), (2), (3)")
        got = _sql(q2_port, "SELECT sum(a) FROM mt")["data"]
        assert got == [["6"]]

        # distributed-flag query executes on the remote-meta node
        _sql(q2_port, "SET enable_distributed_execution = 1")
        got = _sql(q2_port, "SELECT a FROM mt ORDER BY a DESC LIMIT 1")
        assert got["data"] == [["3"]]

        # kill node 2 -> its lease expires -> node 1 sees one node
        procs[2].terminate()
        procs[2].wait(timeout=30)
        deadline = time.time() + 20
        while time.time() < deadline:
            rows = _sql(q1_port,
                        "SELECT count(*) FROM system.clusters"
                        " WHERE description LIKE 'server%'")["data"]
            if int(rows[0][0]) == 1:
                break
            time.sleep(1)
        assert int(rows[0][0]) == 1, rows

        # metactl status against the remote store
        out = subprocess.run(
            [sys.executable, "-m", "databend_tpu.tools.metactl", "status",
             "--meta-endpoint", f"http://127.0.0.1:{meta_port}"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=60)
        assert out.returncode == 0, out.stderr
        st = json.loads(out.stdout)
        assert st["keys"] > 0
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except Exception:
                p.kill()


def test_remote_meta_store_inproc(tmp_path):
    """RemoteMetaStore vs an in-thread meta service: CRUD + CAS parity."""
    from databend_tpu.errors import TableVersionMismatched
    from databend_tpu.meta.kv import RemoteMetaStore
    from databend_tpu.meta.server import serve
    port = _free_port()
    httpd = serve(port, None, in_thread=True)
    try:
        m = RemoteMetaStore(f"http://127.0.0.1:{port}")
        assert m.get("k") == (None, 0)
        assert m.upsert("k", {"x": 1}) == 1
        assert m.get("k") == ({"x": 1}, 1)
        with pytest.raises(TableVersionMismatched):
            m.upsert("k", {"x": 2}, expected_seq=7)
        assert m.upsert("k", {"x": 2}, expected_seq=1) == 2
        m.upsert("k2", [1, 2])
        assert [k for k, _v, _s in m.list_prefix("k")] == ["k", "k2"]
        assert m.next_id("t") == 1 and m.next_id("t") == 2
        m.delete("k2")
        assert m.get("k2") == (None, 0)
        assert m.status()["role"] == "leader"
    finally:
        httpd.shutdown()
