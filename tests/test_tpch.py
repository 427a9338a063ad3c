"""TPC-H correctness vs a pandas reference (benchmarks/tpch.py harness).

The CBO's done-criterion suite (VERDICT r1 item 2, r2 item 3): all 22
reference queries run in the benchmark harness; this test keeps a
representative subset fast for CI — including the decorrelation-heavy
shapes (q2/q17/q21 correlated scalar agg + non-equi EXISTS, q4 unqualified
correlation, q11 HAVING subquery, q19 OR-factored join predicate).
"""

import datetime as dt

import numpy as np
import pytest

from benchmarks.tpch import QUERIES, check, expected, frames, generate, load

EPOCH = dt.date(1970, 1, 1)

SUBSET = ["q1", "q2", "q3", "q4", "q5", "q6", "q10", "q11", "q13", "q15",
          "q17", "q19", "q21", "q22"]


@pytest.fixture(scope="module")
def tpch_ctx(tmp_path_factory):
    from databend_tpu.service.session import SessionContext
    ctx = SessionContext(data_root=str(tmp_path_factory.mktemp("tpch")))
    data = generate(0.002)  # ~12k lineitem rows
    load(ctx, data)
    return ctx, frames(data)


@pytest.mark.parametrize("qname", SUBSET)
def test_tpch_query(tpch_ctx, qname):
    ctx, F = tpch_ctx
    got = ctx.sql(QUERIES[qname]).rows()
    assert check(qname, got, expected(F, qname)), (qname, got[:3])


def test_tpch_q5_plan_reordered(tpch_ctx):
    """Six-way join: lineitem (largest) must be the probe side at the top
    of the join tree, not joined last as written."""
    ctx, _ = tpch_ctx
    lines = [r[0] for r in ctx.sql("EXPLAIN " + QUERIES["q5"]).rows()]
    scans = [l.strip() for l in lines if "Scan:" in l]
    assert "lineitem" in scans[0], "\n".join(lines)
