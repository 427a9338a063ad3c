"""Device rank-code equi-join routes (pipeline/device_join_agg.py).

J1: joins as dictionary enrichment (virtual columns over fact fk codes);
J2: aggregate pushdown through 1:N joins. Results must equal the host
hash-join path exactly. Reference: hash_join_build_state.rs:114 /
hash_join_probe_state.rs, re-designed so no row crosses the link.
"""

import tempfile

import numpy as np
import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import Column, DataBlock
from databend_tpu.types import Float64, Int64, String
from databend_tpu.utils.metrics import METRICS


def _joined():
    return METRICS.snapshot().get("device_join_agg_queries", 0)


def _errors():
    return METRICS.snapshot().get("device_join_agg_errors", 0)


@pytest.fixture()
def ctx():
    c = SessionContext(data_root=tempfile.mkdtemp())
    c.sql("set device_scan_agg_min_rows = 0")
    yield c


def _mkstar(ctx, n_fact=8000, n_dim=300, seed=0):
    """fact(fk, fk2 nullable, v, cat) + dim(k unique, attr, grp, price)
    + dim2(k2 unique, region)."""
    rng = np.random.default_rng(seed)
    fk = rng.integers(0, n_dim + 20, n_fact)  # some fks miss the dim
    fk2 = rng.integers(0, 50, n_fact).astype(object)
    fk2[rng.random(n_fact) < 0.1] = None
    v = (rng.random(n_fact) * 100).round(2)
    cat = rng.choice(["x", "y", "z"], n_fact)
    ctx.sql("create table fact (fk bigint, fk2 bigint null,"
            " v double, cat string)")
    ctx.insert_block("fact", DataBlock(
        ["fk", "fk2", "v", "cat"],
        [Column(Int64, fk.astype(np.int64)),
         Column.from_pylist(list(fk2), Int64.wrap_nullable()),
         Column(Float64, v),
         Column.from_pylist(list(cat), String)]))
    dk = np.arange(n_dim)
    attr = rng.choice(["A", "B", "C", "D"], n_dim)
    grp = rng.integers(0, 7, n_dim)
    price = (rng.random(n_dim) * 10).round(2)
    ctx.sql("create table dim (k bigint, attr string, grp bigint,"
            " price double)")
    ctx.insert_block("dim", DataBlock(
        ["k", "attr", "grp", "price"],
        [Column(Int64, dk.astype(np.int64)),
         Column.from_pylist(list(attr), String),
         Column(Int64, grp.astype(np.int64)),
         Column(Float64, price)]))
    ctx.sql("create table dim2 (k2 bigint, region string)")
    ctx.insert_block("dim2", DataBlock(
        ["k2", "region"],
        [Column(Int64, np.arange(50, dtype=np.int64)),
         Column.from_pylist([f"r{i % 5}" for i in range(50)], String)]))


def _both(ctx, sql):
    ctx.sql("set enable_device_local_execution = 0")
    host = ctx.sql(sql).rows()
    ctx.sql("set enable_device_local_execution = 1")
    before = _joined()
    dev = ctx.sql(sql).rows()
    assert _joined() == before + 1, f"join route did not engage for: {sql}"
    assert _errors() == 0
    return host, dev


def _assert_same(host, dev):
    assert len(host) == len(dev), (len(host), len(dev))
    for hr, dr in zip(host, dev):
        assert len(hr) == len(dr)
        for a, b in zip(hr, dr):
            if isinstance(a, float) and isinstance(b, float):
                assert b == pytest.approx(a, rel=1e-12, abs=1e-9), (hr, dr)
            else:
                assert a == b, (hr, dr)


def test_inner_join_enrichment(ctx):
    """INNER join: group by a dim attribute, aggregate fact columns —
    one device program, unmatched fact rows dropped by the matched LUT."""
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select attr, count(*), sum(v) from fact
        join dim on fk = k group by attr order by attr""")
    _assert_same(host, dev)


def test_left_join_enrichment_nulls(ctx):
    """LEFT join: unmatched fact rows survive with NULL dim attributes
    (the -1 virtual code IS the SQL NULL)."""
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select attr, count(*), count(grp), sum(v) from fact
        left join dim on fk = k group by attr order by attr""")
    _assert_same(host, dev)


def test_join_dim_filter_and_fact_filter(ctx):
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select attr, count(*), sum(v) from fact
        join dim on fk = k
        where grp < 4 and cat <> 'z' and v > 5
        group by attr order by attr""")
    _assert_same(host, dev)


def test_join_agg_over_dim_values(ctx):
    """SUM/AVG/MIN/MAX over dim attributes ride the dictionary value
    planes of the virtual column."""
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select cat, sum(price), avg(price), min(attr), max(grp), count(*)
        from fact join dim on fk = k group by cat order by cat""")
    _assert_same(host, dev)


def test_join_merged_dim_group_keys(ctx):
    """Several dim attributes as group keys merge into ONE tuple entry
    over the fact fk slot (q18's 5-key group)."""
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select grp, attr, count(*), sum(v) from fact
        join dim on fk = k where grp < 3
        group by grp, attr order by grp, attr""")
    _assert_same(host, dev)


def test_chained_joins_two_dims(ctx):
    """Snowflake: fact -> dim2 via nullable fk2, plus dim — LUT chains
    compose host-side, still one device program."""
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select region, attr, count(*), sum(v) from fact
        join dim on fk = k
        join dim2 on fk2 = k2
        group by region, attr order by region, attr""")
    _assert_same(host, dev)


def test_join_count_distinct(ctx):
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select attr, count(distinct cat), count(distinct fk2)
        from fact join dim on fk = k group by attr order by attr""")
    _assert_same(host, dev)


def test_j2_agg_pushdown_left(ctx):
    """q13 shape: group by the LEFT key of a 1:N LEFT join, counting
    right rows — the right side aggregates on device, the join never
    runs."""
    _mkstar(ctx)
    # dim is the 1 side, fact the N side: group dim keys, count fact
    host, dev = _both(ctx, """
        select k, count(v) from dim
        left join fact on k = fk group by k order by k""")
    _assert_same(host, dev)


def test_j2_agg_pushdown_residual_and_inner(ctx):
    _mkstar(ctx)
    host, dev = _both(ctx, """
        select k, count(v), sum(v) from dim
        join fact on k = fk and cat <> 'x'
        group by k order by k""")
    _assert_same(host, dev)


def test_join_route_bails_cleanly(ctx):
    """Ineligible shapes fall back to the host join with zero errors:
    non-unique dim keys (both directions), FULL joins."""
    _mkstar(ctx)
    ctx.sql("set enable_device_local_execution = 1")
    before = _joined()
    # dim side non-unique on both sides -> no J1; group key is not the
    # left join key -> no J2
    ctx.sql("select f1.cat, count(*) from fact f1"
            " join fact f2 on f1.fk = f2.fk group by f1.cat").rows()
    assert _joined() == before
    assert _errors() == 0
