"""TPC-DS acceptance: every one of the 99 reference query shapes runs
through the engine and matches the independent pandas implementation
(tiny sf so the suite stays fast; benchmarks/tpcds.py runs bigger).
Reference: tests/sqllogictests/suites/tpcds/Q1-Q99."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from tpcds import generate, load, frames            # noqa: E402
from tpcds_queries import QUERIES                   # noqa: E402
from tpcds_expected import EXPECTED, _FLOAT_COLS, check_query  # noqa: E402

ALL = sorted((q for q in QUERIES if q in EXPECTED or q in _FLOAT_COLS),
             key=lambda n: int(n[1:]))
# the heaviest shapes at tiny sf still take seconds; keep a fast core set
# for -x runs and let the full sweep run in benchmarks/tpcds.py
SKIP_SLOW = set()


@pytest.fixture(scope="module")
def tpcds_ctx(tmp_path_factory):
    from databend_tpu import SessionContext
    data = generate(0.002)
    ctx = SessionContext(
        data_root=str(tmp_path_factory.mktemp("tpcds")))
    load(ctx, data)
    return ctx, frames(data)


@pytest.mark.parametrize("qname", ALL)
def test_tpcds_query(tpcds_ctx, qname):
    ctx, F = tpcds_ctx
    got = ctx.sql(QUERIES[qname]).rows()
    assert check_query(F, qname, got), f"{qname} mismatch: {got[:3]}"
