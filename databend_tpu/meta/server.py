"""Standalone meta service process.

Reference: query nodes talk gRPC to a raft-replicated `databend-meta`
service (Cargo.toml:170, src/meta/store/src/local.rs — MetaStore is
either an embedded local store or a grpc client). The TPU-native
deployment mirrors that process boundary with a small HTTP KV service
wrapping the same OCC `MetaStore`: query processes dial it through
`RemoteMetaStore` when `meta_endpoint` is configured, so the cluster
registry, leases, locks and the catalog all live in ONE shared meta
process instead of per-process embedded KVs.

Run: python -m databend_tpu.meta.server --port 9191 [--path meta.db]

API (JSON over POST, mirroring the MetaStore methods 1:1):
  /v1/kv/get      {key}                        -> {value, seq}
  /v1/kv/list     {prefix}                     -> {items: [[k, v, seq]..]}
  /v1/kv/upsert   {key, value, expected_seq?}  -> {seq} | 409 CAS error
  /v1/kv/delete   {key, expected_seq?}         -> {} | 409
  /v1/kv/next_id  {counter}                    -> {id}
  GET /v1/status                               -> {role, keys, uptime_s}
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from ..errors import TableVersionMismatched
from .kv import MetaStore


class MetaService:
    def __init__(self, path: Optional[str] = None):
        self.store = MetaStore(path)
        self.started = time.time()

    def handle(self, op: str, body: dict):
        if op == "get":
            value, seq = self.store.get(body["key"])
            return {"value": value, "seq": seq}
        if op == "list":
            items = self.store.list_prefix(body["prefix"])
            return {"items": [[k, v, s] for k, v, s in items]}
        if op == "upsert":
            seq = self.store.upsert(body["key"], body["value"],
                                    body.get("expected_seq"))
            return {"seq": seq}
        if op == "delete":
            self.store.delete(body["key"], body.get("expected_seq"))
            return {}
        if op == "next_id":
            return {"id": self.store.next_id(body["counter"])}
        raise ValueError(f"unknown op {op!r}")

    def status(self):
        n = len(self.store.list_prefix(""))
        return {"role": "leader", "keys": n,
                "uptime_s": time.time() - self.started}


def make_handler(svc: MetaService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/v1/status":
                return self._reply(200, svc.status())
            return self._reply(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/v1/kv/"):
                return self._reply(404, {"error": "not found"})
            op = self.path[len("/v1/kv/"):]
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                out = svc.handle(op, body)
                return self._reply(200, out)
            except TableVersionMismatched as e:
                return self._reply(409, {"error": str(e), "cas": True})
            except Exception as e:
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(port: int, path: Optional[str] = None, host: str = "127.0.0.1",
          in_thread: bool = False):
    svc = MetaService(path)
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    if in_thread:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()


def main():  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser(description="databend_tpu meta service")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9191)
    p.add_argument("--path", default=None,
                   help="sqlite path (default: in-memory)")
    a = p.parse_args()
    print(f"meta service on {a.host}:{a.port} "
          f"({'sqlite ' + a.path if a.path else 'in-memory'})", flush=True)
    serve(a.port, a.path, a.host)


if __name__ == "__main__":  # pragma: no cover
    main()
