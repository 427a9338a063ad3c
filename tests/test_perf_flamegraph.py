"""EXPLAIN PERF + on-demand flamegraphs.

Reference: interpreter_explain_perf.rs (EXPLAIN PERF returns one HTML
row embedding a flamegraph), src/common/base/src/runtime/perf/
(on-demand capture + HTML templates).
"""

import numpy as np
import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import Column, DataBlock
from databend_tpu.utils.perf import (SamplingProfiler, profile_call,
                                     render_flamegraph_svg)


@pytest.fixture
def ctx(tmp_path):
    c = SessionContext(data_root=str(tmp_path / "data"))
    c.sql("CREATE TABLE pf (g BIGINT, v DOUBLE)")
    rng = np.random.default_rng(0)
    c.insert_block("pf", DataBlock(
        ["g", "v"],
        [Column.from_numpy(rng.integers(0, 100, 200000).astype(np.int64)),
         Column.from_numpy(rng.random(200000))]))
    return c


def _busy():
    total = 0.0
    for _ in range(40):
        total += float(np.linalg.norm(np.random.default_rng(1)
                                      .random((400, 400))))
    return total


def test_sampling_profiler_captures_stacks():
    result, prof = profile_call(_busy, hz=200)
    assert result > 0
    assert prof.samples > 0 and prof.folded
    lines = prof.folded_lines()
    # the busy function must appear in the hottest stacks
    assert any("_busy" in ln for ln in lines)
    # folded format: "a;b;c N"
    head = lines[0].rsplit(" ", 1)
    assert head[1].isdigit() and ";" in head[0] or head[0]


def test_flamegraph_svg_renders():
    _, prof = profile_call(_busy, hz=200)
    svg = render_flamegraph_svg(prof.folded)
    assert svg.startswith("<svg") and "<rect" in svg and "samples" in svg
    # empty capture renders a placeholder, not an error
    assert "no samples" in render_flamegraph_svg({})


def test_explain_perf_sql(ctx):
    res = ctx.sql("EXPLAIN PERF SELECT g, sum(v) FROM pf GROUP BY g"
                  " ORDER BY 2 DESC LIMIT 5")
    rows = res.rows()
    assert len(rows) == 1
    page = rows[0][0]
    assert page.startswith("<!DOCTYPE html>")
    assert "flamegraph-container" in page and "<svg" in page
    # the query actually ran under the profiler on this process's engine:
    # engine frames appear in the capture
    assert "databend_tpu" in page


def test_explain_perf_propagates_errors(ctx):
    with pytest.raises(Exception):
        ctx.sql("EXPLAIN PERF SELECT * FROM no_such_table_xyz")


def test_admin_flamegraph_endpoint(tmp_path):
    pytest.importorskip("aiohttp")
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from databend_tpu.service.http.server import QueryServer
    srv = QueryServer(data_root=str(tmp_path / "data"))
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(srv.make_app()), loop=loop)
    loop.run_until_complete(client.start_server())

    async def go():
        r = await client.get("/v1/admin/flamegraph?seconds=0.3")
        assert r.status == 200
        assert r.content_type == "image/svg+xml"
        return await r.text()

    try:
        body = loop.run_until_complete(go())
        assert body.startswith("<svg")
    finally:
        loop.run_until_complete(client.close())
        loop.close()
