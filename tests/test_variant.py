"""VARIANT (JSON) type + functions."""

import pytest

from databend_tpu.errors import DatabendError


def test_parse_json_and_get(tmp_catalog):
    c = tmp_catalog
    r = c.sql("""SELECT parse_json('{"a": 1, "b": [10, 20]}') -> 'a'""")
    assert r.scalar() == "1"
    r = c.sql("""SELECT parse_json('{"a": {"x": "hi"}}') -> 'a' ->> 'x'""")
    assert r.scalar() == "hi"
    r = c.sql("""SELECT parse_json('[5, 6, 7]') -> 1""")
    assert r.scalar() == "6"
    assert c.sql("""SELECT parse_json('{"a":1}') -> 'missing'""").scalar() is None
    with pytest.raises(DatabendError):
        c.sql("SELECT parse_json('not json')")
    assert c.sql("SELECT try_parse_json('not json')").scalar() is None


def test_variant_column_in_table(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ev (id BIGINT, payload VARIANT)")
    c.sql("""INSERT INTO ev VALUES
        (1, '{"kind": "click", "n": 3}'),
        (2, '{"kind": "view", "n": 7}')""")
    rows = c.sql("SELECT id, payload ->> 'kind' AS k FROM ev ORDER BY id").rows()
    assert rows == [(1, "click"), (2, "view")]
    # filter + aggregate over extracted values
    total = c.sql("SELECT sum(CAST(payload ->> 'n' AS BIGINT)) FROM ev").scalar()
    assert total == 10


def test_json_typeof_and_array_length(tmp_catalog):
    c = tmp_catalog
    assert c.sql("SELECT json_typeof(parse_json('[1,2]'))").scalar() == "array"
    assert c.sql("SELECT json_typeof(parse_json('{}'))").scalar() == "object"
    assert c.sql("SELECT json_array_length(parse_json('[1,2,3]'))").scalar() == 3
    assert c.sql("SELECT json_array_length(parse_json('{}'))").scalar() is None
