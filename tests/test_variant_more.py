"""Extended VARIANT function family (variant_more.py).

Reference: src/query/functions/src/scalars/variant.rs behaviors.
"""

import pytest

from databend_tpu import SessionContext


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def q1(ctx, sql):
    rows = ctx.sql(sql).rows()
    assert len(rows) == 1
    return rows[0]


def test_type_predicates(ctx):
    assert q1(ctx, """SELECT is_object(parse_json('{}')),
        is_array(parse_json('[]')), is_string(parse_json('"s"')),
        is_boolean(parse_json('true')), is_integer(parse_json('1')),
        is_float(parse_json('1.5')), is_null_value(parse_json('null'))""") \
        == (True, True, True, True, True, True, True)
    assert q1(ctx, "SELECT is_object(parse_json('[1]'))") == (False,)


def test_as_casts(ctx):
    assert q1(ctx, "SELECT as_string(parse_json('\"x\"'))") == ("x",)
    assert q1(ctx, "SELECT as_integer(parse_json('7'))") == (7,)
    assert q1(ctx, "SELECT as_integer(parse_json('\"7\"'))") == (None,)
    assert q1(ctx, "SELECT as_float(parse_json('2.5'))") == (2.5,)
    assert q1(ctx, "SELECT as_boolean(parse_json('true'))") == (True,)
    assert q1(ctx, "SELECT as_array(parse_json('[1,2]'))") == ("[1,2]",)


def test_paths(ctx):
    j = "parse_json('{\"a\":{\"b\":[10,20],\"C\":1}}')"
    assert q1(ctx, f"SELECT get_path({j}, 'a.b[1]')") == ("20",)
    assert q1(ctx, f"SELECT get_path({j}, 'a.missing')") == (None,)
    assert q1(ctx, f"SELECT json_extract_path_text({j}, 'a.b')") == ("[10,20]",)
    assert q1(ctx, f"SELECT get_ignore_case(json_get({j}, 'a'), 'c')") == ("1",)


def test_array_ops(ctx):
    assert q1(ctx, "SELECT array_append(parse_json('[1]'), 2)") == ("[1,2]",)
    assert q1(ctx, "SELECT array_prepend(parse_json('[1]'), 0)") == ("[0,1]",)
    assert q1(ctx, "SELECT array_compact(parse_json('[1,null,2]'))") == ("[1,2]",)
    assert q1(ctx, "SELECT array_reverse(parse_json('[1,2,3]'))") == ("[3,2,1]",)
    assert q1(ctx, "SELECT array_distinct(parse_json('[1,1,2,1]'))") == ("[1,2]",)
    assert q1(ctx, "SELECT array_flatten(parse_json('[[1],[2,3]]'))") == ("[1,2,3]",)
    assert q1(ctx, "SELECT array_indexof(parse_json('[5,7]'), 7)") == (2,)
    assert q1(ctx, "SELECT array_remove(parse_json('[1,2,1]'), 1)") == ("[2]",)
    assert q1(ctx, "SELECT array_except(parse_json('[1,2,3]'), '[2]')") == ("[1,3]",)
    assert q1(ctx, "SELECT array_intersection(parse_json('[1,2]'), '[2,3]')") == ("[2]",)
    assert q1(ctx, "SELECT array_overlap(parse_json('[1,2]'), '[9]')") == (False,)


def test_object_ops(ctx):
    assert q1(ctx, "SELECT object_keys(parse_json('{\"b\":1,\"a\":2}'))") \
        == ('["a","b"]',)
    assert q1(ctx, "SELECT json_strip_nulls(parse_json('{\"a\":null,\"b\":1}'))") \
        == ('{"b":1}',)
    assert q1(ctx, "SELECT json_contains_in_left(parse_json('{\"a\":1,\"b\":2}'),"
                   " '{\"a\":1}')") == (True,)


def test_constructors(ctx):
    assert q1(ctx, "SELECT json_object('k', 1, 'l', 'two')") \
        == ('{"k":1,"l":"two"}',)
    assert q1(ctx, "SELECT json_array(1, 'x', parse_json('[2]'))") \
        == ('[1,"x",[2]]',)


def test_null_propagation_over_table(ctx):
    ctx.sql("CREATE OR REPLACE TABLE vm_t (j VARIANT NULL)")
    ctx.sql("""INSERT INTO vm_t VALUES ('{"a": 5}'), (NULL)""")
    rows = ctx.sql("SELECT as_integer(json_get(j, 'a')) FROM vm_t").rows()
    assert sorted(rows, key=lambda r: (r[0] is None, r)) == [(5,), (None,)]
