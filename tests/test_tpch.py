"""TPC-H subset correctness: q1/q3/q5/q6/q10 vs a pandas reference.

The CBO's done-criterion suite (VERDICT r1 item 2): multi-join analytics
must produce exact results with joins reordered by cost.
"""

import datetime as dt

import numpy as np
import pytest

from benchmarks.tpch import QUERIES, expected, generate, load

EPOCH = dt.date(1970, 1, 1)


@pytest.fixture(scope="module")
def tpch_ctx(tmp_path_factory):
    from databend_tpu.service.session import SessionContext
    ctx = SessionContext(data_root=str(tmp_path_factory.mktemp("tpch")))
    data = generate(0.002)  # ~12k lineitem rows
    load(ctx, data)
    return ctx, data


def _norm(v):
    if isinstance(v, dt.date):
        return (v - EPOCH).days
    if isinstance(v, float):
        return round(v, 2)
    if isinstance(v, np.generic):
        return _norm(v.item())
    return v


@pytest.mark.parametrize("qname", ["q1", "q3", "q5", "q6", "q10"])
def test_tpch_query(tpch_ctx, qname):
    ctx, data = tpch_ctx
    got = [[_norm(v) for v in row] for row in ctx.sql(QUERIES[qname]).rows()]
    exp = [[_norm(v) for v in row] for row in expected(data, qname)]
    assert len(got) == len(exp), (qname, len(got), len(exp))
    for g, e in zip(got, exp):
        assert len(g) == len(e)
        for gv, ev in zip(g, e):
            if isinstance(ev, float):
                assert gv == pytest.approx(ev, rel=1e-6), (qname, g, e)
            else:
                assert gv == ev, (qname, g, e)


def test_tpch_q5_plan_reordered(tpch_ctx):
    """Six-way join: lineitem (largest) must be the probe side at the top
    of the join tree, not joined last as written."""
    ctx, _ = tpch_ctx
    lines = [r[0] for r in ctx.sql("EXPLAIN " + QUERIES["q5"]).rows()]
    scans = [l.strip() for l in lines if "Scan:" in l]
    assert "lineitem" in scans[0], "\n".join(lines)
