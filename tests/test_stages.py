"""Stage surface: CREATE/DROP/DESC STAGE, LIST/REMOVE, PRESIGN,
COPY INTO from/to @stage, SELECT FROM @stage with schema inference.

Reference behavior: src/query/storages/stage, interpreter_stage_*.rs,
tests/sqllogictests stage suites.
"""

import os

import pytest

from databend_tpu import SessionContext


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_stage_crud_and_show(ctx):
    ctx.sql("CREATE STAGE s1 COMMENT = 'landing'")
    ctx.sql("CREATE STAGE IF NOT EXISTS s1")
    with pytest.raises(Exception):
        ctx.sql("CREATE STAGE s1")
    rows = ctx.sql("SHOW STAGES").rows()
    assert ("s1", "Internal") == rows[0][:2]
    d = ctx.sql("DESC STAGE s1").to_pydict()
    assert d["stage_type"] == ["Internal"]
    assert d["comment"] == ["landing"]
    ctx.sql("DROP STAGE s1")
    assert ctx.sql("SHOW STAGES").rows() == []
    ctx.sql("DROP STAGE IF EXISTS s1")


def test_external_stage_url(ctx, tmp_path):
    loc = tmp_path / "ext"
    loc.mkdir()
    ctx.sql(f"CREATE STAGE ext URL = '{loc}'")
    d = ctx.sql("DESC STAGE ext").to_pydict()
    assert d["stage_type"] == ["External"]
    assert d["url"] == [str(loc)]


def test_list_put_remove(ctx):
    ctx.sql("CREATE STAGE s2")
    ctx.stages.put_bytes("@s2", "a.csv", b"1,x\n2,y\n")
    ctx.stages.put_bytes("@s2", "b.csv", b"3,z\n")
    ctx.stages.put_bytes("@s2", "sub/c.txt", b"zz")
    rows = ctx.sql("LIST @s2").rows()
    assert [r[0] for r in rows] == ["a.csv", "b.csv", "sub/c.txt"]
    assert rows[0][1] == 8
    rows = ctx.sql("LIST @s2 PATTERN = '*.csv'").rows()
    assert [r[0] for r in rows] == ["a.csv", "b.csv"]
    n = ctx.sql("REMOVE @s2 PATTERN = '*.txt'").affected_rows
    assert n == 1
    assert [r[0] for r in ctx.sql("LIST @s2").rows()] == ["a.csv", "b.csv"]


def test_copy_from_stage_with_dedup(ctx):
    ctx.sql("CREATE TABLE t (id INT, s VARCHAR)")
    ctx.sql("CREATE STAGE land")
    ctx.stages.put_bytes("@land", "p1.csv", b"1,a\n2,b\n")
    r = ctx.sql("COPY INTO t FROM @land FILE_FORMAT = (type = CSV)")
    assert r.affected_rows == 2
    # second COPY skips the already-loaded file (reference copied-files dedup)
    r = ctx.sql("COPY INTO t FROM @land FILE_FORMAT = (type = CSV)")
    assert r.affected_rows == 0
    # FORCE=TRUE reloads
    r = ctx.sql("COPY INTO t FROM @land FILE_FORMAT = (type = CSV) FORCE = TRUE")
    assert r.affected_rows == 2
    # a new file loads incrementally
    ctx.stages.put_bytes("@land", "p2.csv", b"3,c\n")
    r = ctx.sql("COPY INTO t FROM @land FILE_FORMAT = (type = CSV)")
    assert r.affected_rows == 1
    assert ctx.sql("SELECT count(*), max(id) FROM t").rows() == [(5, 3)]


def test_copy_files_subset(ctx):
    ctx.sql("CREATE TABLE t2 (id INT)")
    ctx.sql("CREATE STAGE s3")
    ctx.stages.put_bytes("@s3", "one.csv", b"1\n")
    ctx.stages.put_bytes("@s3", "two.csv", b"2\n")
    r = ctx.sql("COPY INTO t2 FROM @s3 FILES = ('two.csv')")
    assert r.affected_rows == 1
    assert ctx.sql("SELECT id FROM t2").rows() == [(2,)]


def test_copy_into_stage_and_back(ctx):
    ctx.sql("CREATE TABLE src (id INT, v DOUBLE)")
    ctx.sql("INSERT INTO src VALUES (1, 1.5), (2, 2.5)")
    ctx.sql("CREATE STAGE out")
    ctx.sql("COPY INTO @out/dump.csv FROM src")
    assert [r[0] for r in ctx.sql("LIST @out").rows()] == ["dump.csv"]
    ctx.sql("CREATE TABLE back (id INT, v DOUBLE)")
    r = ctx.sql("COPY INTO back FROM @out FILE_FORMAT = (type = CSV)")
    assert r.affected_rows == 2
    assert ctx.sql("SELECT sum(id), sum(v) FROM back").rows() == [(3, 4.0)]


def test_select_from_stage_csv_positional(ctx):
    ctx.sql("CREATE STAGE q")
    ctx.stages.put_bytes("@q", "d.csv", b"1,ab\n2,cd\n3,ef\n")
    rows = ctx.sql("SELECT $1, $2 FROM @q (file_format => 'csv') ORDER BY $1").rows()
    assert rows == [("1", "ab"), ("2", "cd"), ("3", "ef")]
    # aggregate over inferred positional columns
    assert ctx.sql("SELECT count(*) FROM @q").rows() == [(3,)]


def test_select_from_stage_ndjson_named(ctx):
    ctx.sql("CREATE STAGE j")
    ctx.stages.put_bytes("@j", "d.ndjson",
                         b'{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    rows = ctx.sql("SELECT a, b FROM @j ORDER BY a DESC").rows()
    assert rows == [(2, "y"), (1, "x")]
    assert ctx.sql("SELECT sum(a) FROM @j").rows() == [(3,)]


def test_select_from_stage_parquet(ctx):
    ctx.sql("CREATE TABLE psrc (id BIGINT, name VARCHAR)")
    ctx.sql("INSERT INTO psrc VALUES (10, 'n1'), (20, 'n2')")
    ctx.sql("CREATE STAGE p")
    # write a parquet file into the stage via COPY
    ctx.sql("COPY INTO @p/part.parquet FROM psrc FILE_FORMAT = (type = PARQUET)")
    rows = ctx.sql("SELECT name, id FROM @p ORDER BY id").rows()
    assert rows == [("n1", 10), ("n2", 20)]


def test_user_stage_tilde(ctx):
    ctx.stages.put_bytes("@~", "u.csv", b"9\n")
    assert [r[0] for r in ctx.sql("LIST @~").rows()] == ["u.csv"]


def test_presign(ctx):
    ctx.sql("CREATE STAGE ps")
    ctx.stages.put_bytes("@ps", "f.csv", b"1\n")
    d = ctx.sql("PRESIGN DOWNLOAD @ps/f.csv").to_pydict()
    assert d["method"] == ["GET"]
    assert d["url"][0].startswith("file://")
    d = ctx.sql("PRESIGN UPLOAD @ps/new.csv EXPIRE = 60").to_pydict()
    assert d["method"] == ["PUT"]


def test_drop_internal_stage_removes_files(ctx, tmp_path):
    ctx.sql("CREATE STAGE gone")
    key = ctx.stages.put_bytes("@gone", "f.bin", b"abc")
    assert os.path.exists(key)
    ctx.sql("DROP STAGE gone")
    assert not os.path.exists(key)


def test_system_stages_table(ctx):
    ctx.sql("CREATE STAGE sysst")
    ctx.stages.put_bytes("@sysst", "x.csv", b"1\n")
    rows = ctx.sql("SELECT name, stage_type, number_of_files FROM system.stages").rows()
    assert ("sysst", "Internal", 1) in rows


# ------------------------------------------ connection-scoped data plane
# (reference: per-stage storage params, src/meta/app-storage; the stage
# operator authenticates with the stage's CONNECTION instead of the
# ambient chain)

def test_stage_with_inline_connection_isolated(ctx):
    from databend_tpu.storage.operator import OPERATOR
    ctx.sql("CREATE STAGE cs1 URL='s3://connbucket/a'"
            " CONNECTION=(access_key_id='AK1' secret_access_key='SK1')")
    ctx.sql("CREATE STAGE cs2 URL='s3://connbucket/a'"
            " CONNECTION=(access_key_id='AK2' secret_access_key='SK2')")
    info1, _ = ctx.stages.resolve("@cs1")
    ctx.stages.put_bytes("@cs1", "f.csv", b"1\n")
    # same URL, different credentials -> different (scoped) backends:
    # the second connection must NOT see the first connection's object
    assert ctx.stages.list_files("@cs1") == [("f.csv", 2)]
    assert ctx.stages.list_files("@cs2") == []
    # and the ambient operator doesn't see it either
    assert OPERATOR.list("s3://connbucket/a") == []


def test_stage_with_named_connection(ctx):
    ctx.sql("CREATE CONNECTION nc STORAGE_TYPE='s3'"
            " access_key_id='NAK' secret_access_key='NSK'")
    ctx.sql("CREATE STAGE ncs URL='s3://connbucket/b'"
            " CONNECTION=(connection_name='nc')")
    ctx.stages.put_bytes("@ncs", "g.csv", b"2,3\n")
    assert ctx.stages.list_files("@ncs") == [("g.csv", 4)]
    # an equivalent inline-credential stage resolves to the same backend
    ctx.sql("CREATE STAGE ncs2 URL='s3://connbucket/b'"
            " CONNECTION=(access_key_id='NAK' secret_access_key='NSK')")
    assert ctx.stages.list_files("@ncs2") == [("g.csv", 4)]


def test_stage_unknown_named_connection_errors(ctx):
    from databend_tpu.errors import BadArguments
    ctx.sql("CREATE STAGE badc URL='s3://connbucket/c'"
            " CONNECTION=(connection_name='nope')")
    with pytest.raises(BadArguments):
        ctx.stages.list_files("@badc")


def test_desc_stage_redacts_connection_secrets(ctx):
    ctx.sql("CREATE STAGE reds URL='s3://connbucket/d'"
            " CONNECTION=(access_key_id='VISIBLE'"
            " secret_access_key='HIDEME')")
    row = ctx.sql("DESC STAGE reds").rows()[0]
    joined = " ".join(str(v) for v in row)
    assert "VISIBLE" in joined and "HIDEME" not in joined
