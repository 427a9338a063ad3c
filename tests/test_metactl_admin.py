"""metactl export/import + admin HTTP endpoints."""

import io
import json

import pytest

from databend_tpu.meta.kv import MetaStore
from databend_tpu.tools.metactl import export_meta, import_meta, status


def test_metactl_export_import_roundtrip(tmp_path):
    src = MetaStore(str(tmp_path / "a.db"))
    src.upsert("tables/1", {"name": "t1"})
    src.upsert("tables/2", {"name": "t2"})
    src.upsert("users/root", {"roles": []})
    buf = io.StringIO()
    assert export_meta(src, buf) == 3
    st = status(src)
    assert st["keys"] == 3 and st["namespaces"]["tables"] == 2

    dst = MetaStore(str(tmp_path / "b.db"))
    buf.seek(0)
    assert import_meta(dst, buf) == 3
    v, seq = dst.get("tables/2")
    assert v == {"name": "t2"} and seq == 1
    src.close()
    dst.close()


def test_metactl_prefix_export(tmp_path):
    m = MetaStore(str(tmp_path / "c.db"))
    m.upsert("a/1", 1)
    m.upsert("b/1", 2)
    buf = io.StringIO()
    assert export_meta(m, buf, prefix="a/") == 1
    assert json.loads(buf.getvalue())["key"] == "a/1"
    m.close()


def test_admin_endpoints(tmp_path):
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from databend_tpu.service.http.server import QueryServer
    srv = QueryServer(data_root=str(tmp_path / "data"))
    srv.ctx.sql("CREATE TABLE adm (v BIGINT)")
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(srv.make_app()), loop=loop)
    loop.run_until_complete(client.start_server())

    def get(path):
        async def go():
            r = await client.get(path)
            return await r.json()
        return loop.run_until_complete(go())

    try:
        assert "max_threads" in get("/v1/admin/settings")
        body = get("/v1/admin/cluster")
        assert body["self"] in [n["node_id"] for n in body["nodes"]]
        body = get("/v1/admin/tables")
        assert {"database": "default", "name": "adm", "engine": "FUSE"} \
            in body["tables"]
        assert get("/v1/admin/processes")["processes"] == []
    finally:
        loop.run_until_complete(client.close())
        loop.close()
