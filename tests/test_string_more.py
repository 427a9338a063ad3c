"""Extended string function coverage (expression/functions/string_more.py).

Behavioral spec: reference src/query/functions/src/scalars/{string.rs,
string_multi_args.rs} and its sqllogictests (02_0002_function_string*).
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


def test_codecs(ctx):
    assert q1(ctx, "SELECT ascii('A'), ascii(''), ord('a')") == (65, 0, 97)
    assert q1(ctx, "SELECT bit_length('ab'), octet_length('abc')") == (16, 3)
    assert q1(ctx, "SELECT char(72, 105), chr(65)") == ("Hi", "A")
    assert q1(ctx, "SELECT to_hex('ab'), hex('ab')") == ("6162", "6162")
    assert q1(ctx, "SELECT from_hex('6162'), unhex('6162')") == ("ab", "ab")
    assert q1(ctx, "SELECT to_base64('Ab'), from_base64('QWI=')") == ("QWI=", "Ab")
    assert q1(ctx, "SELECT try_from_hex('zz'), try_from_base64('!')") == (None, None)
    assert q1(ctx, "SELECT try_from_hex('6162')") == ("ab",)


def test_structural_edits(ctx):
    assert q1(ctx, "SELECT translate('abcba', 'abc', 'xy')") == ("xyyx",)
    assert q1(ctx, "SELECT insert('Quadratic', 3, 4, 'What')") == ("QuWhattic",)
    assert q1(ctx, "SELECT insert('Quadratic', -1, 4, 'What')") == ("Quadratic",)
    assert q1(ctx, "SELECT strcmp('a','b'), strcmp('b','a'), strcmp('a','a')") == (-1, 1, 0)
    assert q1(ctx, "SELECT split_part('a,b,c', ',', 2), split_part('a,b,c', ',', -1)") == ("b", "c")
    assert q1(ctx, "SELECT split_part('a,b', ',', 9)") == ("",)
    assert q1(ctx, "SELECT substring_index('www.db.com', '.', 2)") == ("www.db",)
    assert q1(ctx, "SELECT substring_index('www.db.com', '.', -2)") == ("db.com",)
    assert q1(ctx, "SELECT trim_both('xxaxx', 'x'), trim_leading('xxa', 'x'), trim_trailing('axx', 'x')") == ("a", "a", "a")
    assert q1(ctx, "SELECT space(3), quote('a''b')") == ("   ", "a\\'b")


def test_fuzzy_distances(ctx):
    assert q1(ctx, "SELECT soundex('Robert'), soundex('Rupert')") == ("R163", "R163")
    assert q1(ctx, "SELECT editdistance('kitten','sitting'), levenshtein('ab','ab')") == (3, 0)
    jw = q1(ctx, "SELECT jaro_winkler('martha','marhta')")[0]
    assert abs(jw - 0.9611) < 1e-3
    assert q1(ctx, "SELECT glob('abc','a*c'), glob('abc','a?d')") == (True, False)


def test_like_any(ctx):
    assert q1(ctx, "SELECT like_any('foobar', '%bar'), like_any('foobar', 'x%', '%baz')") == (True, False)
    assert q1(ctx, "SELECT ilike_any('FooBar', '%bar')") == (True,)


def test_regexp_family(ctx):
    assert q1(ctx, "SELECT regexp_like('abc', 'b.'), regexp_like('ABC', 'b.', 'i')") == (True, True)
    assert q1(ctx, "SELECT regexp_replace('a1b2', '[0-9]', 'X')") == ("aXbX",)
    assert q1(ctx, "SELECT regexp_replace('a1b2c3', '[0-9]', 'X', 1, 2)") == ("a1bXc3",)
    assert q1(ctx, "SELECT regexp_substr('a1b2c3', '[a-z][0-9]', 1, 2)") == ("b2",)
    assert q1(ctx, "SELECT regexp_substr('abc', '[0-9]')") == (None,)
    assert q1(ctx, "SELECT regexp_instr('abcabc', 'b', 1, 2)") == (5,)
    assert q1(ctx, "SELECT regexp_instr('abc', 'z')") == (0,)
    assert q1(ctx, "SELECT regexp_extract('a1b2', '([a-z])([0-9])', 2)") == ("1",)


def test_over_table_with_nulls(ctx):
    ctx.sql("CREATE OR REPLACE TABLE sm_t (s VARCHAR NULL)")
    ctx.sql("INSERT INTO sm_t VALUES ('abc'), (NULL), ('xyz')")
    rows = ctx.sql("SELECT to_hex(s), try_from_hex(s) FROM sm_t ORDER BY s").rows()
    assert rows[0][0] == "616263"
    assert any(r == (None, None) for r in rows)
    ctx.sql("DROP TABLE sm_t")


def test_ansi_forms_and_misc(ctx):
    assert q1(ctx, "SELECT TRIM(BOTH 'x' FROM 'xxaxx')") == ("a",)
    assert q1(ctx, "SELECT TRIM(LEADING 'y' FROM 'yya')") == ("a",)
    assert q1(ctx, "SELECT POSITION('b' IN 'abc')") == (2,)
    assert q1(ctx, "SELECT instr('abc', 'b'), locate('b', 'abc')") == (2, 2)
    assert q1(ctx, "SELECT greatest(1, 5, 3), least(2, 0)") == (5, 0)
    assert q1(ctx, "SELECT 1 <=> 1, NULL <=> NULL, 1 <=> NULL") \
        == (True, True, False)
    assert q1(ctx, "SELECT date_diff('day', to_date('2024-01-01'),"
                   " to_date('2024-01-11'))") == (10,)
    assert q1(ctx, "SELECT date_diff('year', to_date('2020-06-01'),"
                   " to_date('2024-06-01'))") == (4,)
    import datetime
    assert q1(ctx, "SELECT date_add(to_date('2024-01-01'), 10)") \
        == (datetime.date(2024, 1, 11),)
    assert q1(ctx, "SELECT sum(value) FROM unnest([1,2,3])") == (6,)
    assert q1(ctx, "SELECT ifnull(NULL, 5)") == (5,)


def test_surface_batch2(ctx):
    ctx.sql("CREATE OR REPLACE TABLE sb2 (a INT, b VARCHAR, c DOUBLE)")
    ctx.sql("INSERT INTO sb2 VALUES (1,'x',1.5)")
    assert ctx.sql("SELECT * EXCLUDE (b) FROM sb2").rows() == [(1, 1.5)]
    assert ctx.sql("SHOW COLUMNS FROM sb2").to_pydict()["field"] \
        == ["a", "b", "c"]
    assert ctx.sql("SELECT * FROM (VALUES (1,'a'),(2,'b')) AS v(x, y)"
                   " ORDER BY x").rows() == [(1, "a"), (2, "b")]
    assert q1(ctx, "SELECT to_int64('42'), try_to_int64('nope')") == (42, None)
    assert q1(ctx, "SELECT typeof(1.5)") == ("DOUBLE",)
    assert q1(ctx, "SELECT [10,20,30][2]") == (20,)
    ctx.sql("DROP TABLE sb2")
