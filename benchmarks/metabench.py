"""Meta-service throughput/latency bench (the databend-metabench analog;
reference: src/meta/README.md "Binaries" — metabench drives upsert/get
against a raft cluster and reports ops/s).

Spins up a 3-node raft-replicated meta cluster in-process, drives it
with concurrent client threads over the real HTTP wire path, and prints
one JSON line per workload: {workload, ops, secs, ops_per_s, p50_ms,
p99_ms}.

Run: python benchmarks/metabench.py [--clients 8] [--ops 300]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databend_tpu.meta.kv import RemoteMetaStore
from databend_tpu.meta.server import serve


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


def _wait_leader(eps, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        leaders = 0
        for e in eps:
            try:
                if RemoteMetaStore(e, timeout=1.0).status()[
                        "role"] == "leader":
                    leaders += 1
            except Exception:
                pass
        if leaders == 1:
            return
        time.sleep(0.1)
    raise RuntimeError("no raft leader")


def run_workload(name, eps, clients, ops_per_client, op):
    lat = []
    lock = threading.Lock()

    errors = []

    def worker(wid):
        st = RemoteMetaStore(",".join(eps), timeout=5.0)
        mine = []
        try:
            for i in range(ops_per_client):
                t0 = time.perf_counter()
                op(st, wid, i)
                mine.append(time.perf_counter() - t0)
        except Exception as e:
            with lock:
                errors.append(f"{type(e).__name__}: {e}")
        with lock:
            lat.extend(mine)

    ts = [threading.Thread(target=worker, args=(w,)) for w in range(clients)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    secs = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    if errors:
        print(json.dumps({"workload": name, "errors": errors[:3],
                          "completed": n}), flush=True)
        if n == 0:
            return
    print(json.dumps({
        "workload": name, "ops": n, "secs": round(secs, 3),
        "ops_per_s": round(n / secs, 1),
        "p50_ms": round(lat[n // 2] * 1e3, 2),
        "p99_ms": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 2),
        "clients": clients,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--ops", type=int, default=300,
                    help="ops per client per workload")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="metabench_")
    ports = _free_ports(3)
    peers = {f"n{i+1}": f"127.0.0.1:{p}" for i, p in enumerate(ports)}
    eps = [f"http://127.0.0.1:{p}" for p in ports]
    servers = [serve(ports[i], os.path.join(tmp, f"meta{i}.db"),
                     in_thread=True, raft_id=f"n{i+1}", raft_peers=peers,
                     election_timeout=(0.25, 0.5), heartbeat=0.08,
                     compact_threshold=2048)
               for i in range(3)]
    try:
        _wait_leader(eps)
        run_workload("upsert", eps, args.clients, args.ops,
                     lambda st, w, i: st.upsert(f"bench/{w}/{i}", {"i": i}))
        run_workload("get", eps, args.clients, args.ops,
                     lambda st, w, i: st.get(f"bench/{w}/{i}"))
        run_workload("upsert_cas", eps, args.clients, args.ops,
                     lambda st, w, i: st.upsert(f"bench/{w}/{i}", {"i": -i},
                                                expected_seq=1))
        run_workload("next_id", eps, args.clients, args.ops,
                     lambda st, w, i: st.next_id(f"ctr{w}"))
    finally:
        for h in servers:
            try:
                h.meta_service.close()
                h.shutdown()
            except Exception:
                pass


if __name__ == "__main__":
    main()
