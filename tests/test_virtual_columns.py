"""Variant virtual columns (EE): auto-extraction at write, binder
get()-rewrite to the sidecar column, REFRESH VIRTUAL COLUMN, and the
system.virtual_columns registry.

Reference: virtual_column_builder.rs (write), binder/virtual_column.rs
(rewrite), virtual_column_reader_parquet.rs (block-aligned read),
interpreter_virtual_column_refresh.rs (refresh)."""

import tempfile

import pytest

from databend_tpu import SessionContext
from databend_tpu.errors import SemanticError


ROWS = [
    '{"a": 1, "b": {"c": "x", "d": 2.5}, "tags": [1,2]}',
    '{"a": 2, "b": {"c": "y"}, "extra": true}',
    '{"a": 3, "b": {"c": "z", "d": 7.25}}',
]


@pytest.fixture()
def ctx():
    c = SessionContext(data_root=tempfile.mkdtemp())
    c.sql("set enable_experimental_virtual_column = 1")
    yield c


def _load(ctx, table="t"):
    ctx.sql(f"create table {table} (id int, v variant)")
    for i, r in enumerate(ROWS):
        ctx.sql(f"insert into {table} values ({i}, parse_json('{r}'))")


def test_extraction_at_write_and_rewrite(ctx):
    _load(ctx)
    # the rewrite engages: the scan surfaces the sidecar column
    plan = ctx.sql("explain select v['a'] from t").rows()
    assert any("virtual_columns=[v['a']]" in r[0] for r in plan), plan
    assert ctx.sql("select v['a'] from t order by id").rows() == \
        [("1",), ("2",), ("3",)]
    # nested path + identical rendering to the plain get() path
    got = ctx.sql("select v['b']['c'] from t order by id").rows()
    ctx.sql("set enable_experimental_virtual_column = 0")
    # (the sidecar still exists; disable only affects new writes)
    want = [('"x"',), ('"y"',), ('"z"',)]
    assert got == want


def test_missing_path_rows_are_null(ctx):
    _load(ctx)
    got = ctx.sql("select v['b']['d'] from t order by id").rows()
    assert got == [("2.5",), (None,), ("7.25",)]
    got = ctx.sql("select v['extra'] from t order by id").rows()
    assert got == [(None,), ("true",), (None,)]


def test_unregistered_path_falls_back_to_get(ctx):
    _load(ctx)
    # arrays are not extracted; plain get() must still answer
    got = ctx.sql("select v['tags'] from t where id = 0").rows()
    assert got == [("[1,2]",)]
    plan = ctx.sql("explain select v['tags'] from t").rows()
    assert not any("virtual_columns" in r[0] for r in plan)


def test_filter_on_virtual_column(ctx):
    _load(ctx)
    got = ctx.sql("select id from t where v['b']['c'] = parse_json('\"y\"')"
                  " order by id").rows()
    assert got == [(1,)]


def test_refresh_for_preexisting_data(ctx):
    ctx.sql("set enable_experimental_virtual_column = 0")
    _load(ctx)
    plan = ctx.sql("explain select v['a'] from t").rows()
    assert not any("virtual_columns" in r[0] for r in plan)
    ctx.sql("set enable_experimental_virtual_column = 1")
    ctx.sql("refresh virtual column for t")
    plan = ctx.sql("explain select v['a'] from t").rows()
    assert any("virtual_columns=[v['a']]" in r[0] for r in plan), plan
    assert ctx.sql("select v['a'] from t order by id").rows() == \
        [("1",), ("2",), ("3",)]


def test_refresh_requires_variant_column(ctx):
    ctx.sql("create table plain (x int)")
    ctx.sql("insert into plain values (1)")
    with pytest.raises(SemanticError):
        ctx.sql("refresh virtual column for plain")


def test_system_virtual_columns(ctx):
    _load(ctx)
    rows = ctx.sql("select * from system.virtual_columns").rows()
    hit = [r for r in rows if r[1] == "t"]
    assert hit and "v['a']" in hit[0][2]


def test_join_falls_back(ctx):
    """Joins keep plain get() semantics (rewrite is single-table v1)."""
    _load(ctx)
    _load(ctx, table="t2")
    got = ctx.sql("select t.v['a'] from t join t2 on t.id = t2.id"
                  " where t2.id = 1").rows()
    assert got == [("2",)]


def test_fuse_virtual_column_table_function(ctx):
    _load(ctx)
    rows = ctx.sql("select * from fuse_virtual_column('default','t')").rows()
    assert rows and all(r[2] >= 1 for r in rows), rows
    assert any("v['a']" in (r[4] or "") for r in rows)


def test_show_virtual_columns(ctx):
    _load(ctx)
    rows = ctx.sql("show virtual columns from t").rows()
    assert rows and rows[0][1] == "t" and "v['a']" in rows[0][2]
    assert ctx.sql("show virtual columns").rows()
