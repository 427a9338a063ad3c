"""HTTP /v1/query protocol tests (aiohttp test client)."""

import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer

from databend_tpu.service.http.server import QueryServer


@pytest.fixture
def client(tmp_path, event_loop=None):
    import asyncio

    srv = QueryServer(data_root=str(tmp_path))
    loop = asyncio.new_event_loop()
    c = TestClient(TestServer(srv.make_app()), loop=loop)
    loop.run_until_complete(c.start_server())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


def _post(client, loop, path, body):
    async def go():
        r = await client.post(path, json=body)
        return r.status, await r.json()
    return loop.run_until_complete(go())


def _get(client, loop, path):
    async def go():
        r = await client.get(path)
        return r.status, (await r.json() if "json" in r.content_type
                          else await r.text())
    return loop.run_until_complete(go())


def test_query_roundtrip(client):
    c, loop = client
    st, body = _post(c, loop, "/v1/query", {"sql": "SELECT 1 + 2"})
    assert st == 200 and body["state"] == "Succeeded"
    assert body["data"] == [["3"]]
    assert body["schema"][0]["name"]

    # DDL + insert + vector search through the wire
    for sql in [
        "CREATE TABLE hx (id INT, emb VECTOR(4))",
        "INSERT INTO hx VALUES (1, [1.0,0.0,0.0,0.0]), (2, [0.0,1.0,0.0,0.0])",
    ]:
        st, b = _post(c, loop, "/v1/query", {"sql": sql})
        assert st == 200 and b["state"] == "Succeeded", b
    st, b = _post(c, loop, "/v1/query", {
        "sql": "SELECT id FROM hx ORDER BY cosine_distance(emb, [1.0,0.0,0.0,0.0]) LIMIT 1"})
    assert b["data"] == [["1"]]
    # final
    st, fin = _post(c, loop, f"/v1/query/{b['id']}/final", {})
    assert fin["state"] == "Succeeded"


def test_query_error_and_health(client):
    c, loop = client
    st, body = _post(c, loop, "/v1/query", {"sql": "SELECT * FROM nope"})
    assert body["state"] == "Failed" and body["error"]["message"]
    st, body = _post(c, loop, "/v1/query", {})
    assert st == 400
    st, h = _get(c, loop, "/v1/health")
    assert h["status"] == "ok"
    st, m = _get(c, loop, "/v1/metrics")
    assert st == 200


def test_pagination(client):
    c, loop = client
    _post(c, loop, "/v1/query", {"sql": "CREATE TABLE big (v BIGINT)"})
    st, b = _post(c, loop, "/v1/query",
                  {"sql": "SELECT number FROM numbers(25000)"})
    assert b["state"] == "Succeeded"
    assert len(b["data"]) == 10000
    nxt = b["next_uri"]
    st, p1 = _get(c, loop, nxt)
    assert len(p1["data"]) == 10000 and p1["next_uri"]
    st, p2 = _get(c, loop, p1["next_uri"])
    assert len(p2["data"]) == 5000 and "final_uri" in p2


def test_http_basic_auth(client):
    import base64
    c, loop = client
    # create a user with a password via root
    _post(c, loop, "/v1/query", {"sql": "CREATE USER web IDENTIFIED BY 'pw'"})
    _post(c, loop, "/v1/query", {"sql": "GRANT SELECT ON *.* TO web"})

    async def go(auth):
        headers = {"Authorization": auth} if auth else {}
        r = await c.post("/v1/query", json={"sql": "SELECT 1"}, headers=headers)
        return r.status, await r.json()

    ok = "Basic " + base64.b64encode(b"web:pw").decode()
    st, body = loop.run_until_complete(go(ok))
    assert st == 200 and body["state"] == "Succeeded"
    bad = "Basic " + base64.b64encode(b"web:wrong").decode()
    st, body = loop.run_until_complete(go(bad))
    assert st == 401


def test_anonymous_rejected_once_root_has_password(client):
    """ADVICE r1: auth is per-request; no header != last authenticated user."""
    c, loop = client
    import base64

    def post_auth(sql, user=None, pw=""):
        async def go():
            headers = {}
            if user is not None:
                tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
                headers["Authorization"] = f"Basic {tok}"
            r = await c.post("/v1/query", json={"sql": sql}, headers=headers)
            return r.status, await r.json()
        return loop.run_until_complete(go())

    st, _ = post_auth("CREATE USER alice IDENTIFIED BY 'secret'")
    assert st == 200
    # authenticated request as alice must NOT make later anonymous
    # requests run as alice nor as a cached identity
    st, body = post_auth("SELECT 1", user="alice", pw="secret")
    assert st == 200 and body["state"] == "Succeeded"
    # anonymous still allowed while root is passwordless...
    st, body = post_auth("SELECT 2")
    assert st == 200
    # ...and alice cannot escalate
    st, body = post_auth("GRANT ALL ON *.* TO alice", user="alice", pw="secret")
    assert st == 200 and body["state"] == "Failed"
    assert "lacks" in body["error"]["message"]
    # wrong password rejected
    st, _ = post_auth("SELECT 1", user="alice", pw="nope")
    assert st == 401


def test_http_params_and_batch(client):
    """Parameterized request (`params`) + batched KNN serving
    (`params_batch`): bind once server-side, one device program per
    batch (service/prepared.py)."""
    c, loop = client
    import numpy as np
    for sql in [
        "CREATE TABLE pv (id BIGINT, emb VECTOR(4))",
        "CREATE VECTOR INDEX pv_v ON pv(emb) ASYNC distance='l2'",
        "INSERT INTO pv VALUES (1, [0.0,0.0,0.0,0.0]),"
        " (2, [1.0,1.0,1.0,1.0]), (3, [2.0,2.0,2.0,2.0]),"
        " (4, [9.0,9.0,9.0,9.0])",
    ]:
        st, body = _post(c, loop, "/v1/query", {"sql": sql})
        assert st == 200 and body["state"] == "Succeeded", body

    # single parameterized execution
    st, body = _post(c, loop, "/v1/query", {
        "sql": "SELECT id FROM pv ORDER BY l2_distance(emb, ?) LIMIT 2",
        "params": [[0.9, 0.9, 0.9, 0.9]]})
    assert st == 200 and body["state"] == "Succeeded", body
    assert [r[0] for r in body["data"]] == ["2", "1"]

    # batched: B=3 query vectors -> one response with 3 result sets
    st, body = _post(c, loop, "/v1/query", {
        "sql": "SELECT id FROM pv ORDER BY l2_distance(emb, ?) LIMIT 1",
        "params_batch": [[[0.1, 0.1, 0.1, 0.1]],
                         [[2.1, 2.1, 2.1, 2.1]],
                         [[8.0, 8.0, 8.0, 8.0]]]})
    assert st == 200, body
    assert [rs[0][0] for rs in body["results"]] == ["1", "3", "4"]

    # generic (non-KNN) parameterized statement over the wire
    st, body = _post(c, loop, "/v1/query", {
        "sql": "SELECT count(*) FROM pv WHERE id > ?", "params": [1]})
    assert st == 200 and body["state"] == "Succeeded", body
    assert body["data"] == [["3"]]
