"""Planner replay: optimizer plan-shape regression goldens.

Reference: src/tests/planner_replay. Goldens live in
tests/goldens/plans/; regenerate deliberately with UPDATE_PLANS=1.
"""

import os

import pytest

from databend_tpu import SessionContext
from databend_tpu.testing.plan_replay import replay

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "plans")

QUERIES = {
    "filter_pushdown_join": (
        "SELECT o.id, c.name FROM orders o JOIN customers c"
        " ON o.cust = c.id WHERE c.name = 'x' AND o.amount > 5"),
    "join_reorder_small_build": (
        "SELECT count(*) FROM orders o JOIN customers c ON o.cust = c.id"),
    "limit_topn": "SELECT id FROM orders ORDER BY amount DESC LIMIT 3",
    "agg_groupby": (
        "SELECT cust, sum(amount), count(*) FROM orders GROUP BY cust"
        " HAVING sum(amount) > 1"),
    "subquery_in": (
        "SELECT id FROM orders WHERE cust IN (SELECT id FROM customers"
        " WHERE name <> 'y')"),
    "stats_count": "SELECT count(*) FROM orders",
    "distinct_project": "SELECT DISTINCT cust FROM orders WHERE amount > 0",
}


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    c = SessionContext(data_root=str(tmp_path_factory.mktemp("replay")))
    c.sql("CREATE TABLE customers (id INT, name VARCHAR)")
    c.sql("CREATE TABLE orders (id INT, cust INT, amount DOUBLE)")
    c.sql("INSERT INTO customers VALUES (1,'x'), (2,'y'), (3,'z')")
    c.sql("INSERT INTO orders SELECT number, number % 3 + 1, number * 1.5"
          " FROM numbers(300)")
    c.sql("ANALYZE TABLE customers")
    c.sql("ANALYZE TABLE orders")
    return c


def test_plan_goldens(ctx):
    update = bool(os.environ.get("UPDATE_PLANS"))
    mismatches = replay(ctx, QUERIES, GOLDEN_DIR, update=update)
    for name, expected, actual in mismatches:
        print(f"=== {name} expected ===\n{expected}")
        print(f"=== {name} actual ===\n{actual}")
    assert not mismatches, (
        f"{len(mismatches)} plan(s) changed: {[m[0] for m in mismatches]};"
        " rerun with UPDATE_PLANS=1 if the change is intended")


def test_goldens_committed():
    """The golden files must exist in the repo (not regenerated ad hoc)."""
    missing = [n for n in QUERIES
               if not os.path.exists(os.path.join(GOLDEN_DIR, n + ".plan"))]
    assert not missing, f"missing goldens: {missing} (run with UPDATE_PLANS=1)"
