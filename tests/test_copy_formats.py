"""COPY INTO (load + unload) across CSV/TSV/NDJSON/Parquet."""

import gzip
import json
import os

import pytest

from databend_tpu.errors import DatabendError


@pytest.fixture
def ctx(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE cp (id BIGINT, name VARCHAR, score DOUBLE)")
    return c


def test_copy_csv_roundtrip(ctx, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,name,score\n1,alpha,1.5\n2,beta,\\N\n3,\"c,d\",3.25\n")
    r = ctx.sql(f"COPY INTO cp FROM '{src}' FILE_FORMAT = (TYPE = CSV SKIP_HEADER = 1)")
    assert r.affected_rows == 3
    rows = ctx.sql("SELECT id, name, score FROM cp ORDER BY id").rows()
    assert rows[0] == (1, "alpha", 1.5)
    assert rows[1][2] is None
    assert rows[2][1] == "c,d"

    out = tmp_path / "out.csv"
    ctx.sql(f"COPY INTO '{out}' FROM cp FILE_FORMAT = (TYPE = CSV)")
    text = out.read_text()
    assert "alpha" in text and "\\N" in text


def test_copy_tsv_and_gzip(ctx, tmp_path):
    src = tmp_path / "in.tsv.gz"
    with gzip.open(src, "wt") as f:
        f.write("7\tzeta\t0.5\n")
    ctx.sql(f"COPY INTO cp FROM '{src}' FILE_FORMAT = (TYPE = TSV COMPRESSION = GZIP)")
    assert ctx.sql("SELECT name FROM cp WHERE id = 7").scalar() == "zeta"


@pytest.mark.parametrize("codec,ext", [("ZSTD", "zst"), ("BZ2", "bz2"),
                                       ("XZ", "xz")])
def test_copy_compressed_roundtrip(ctx, tmp_path, codec, ext):
    """zstd/bz2/xz COPY compression (reference src/common/compress)."""
    out = tmp_path / f"out.csv.{ext}"
    ctx.sql("INSERT INTO cp VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5)")
    ctx.sql(f"COPY INTO '{out}' FROM cp"
            f" FILE_FORMAT = (TYPE = CSV COMPRESSION = {codec})")
    assert out.exists() and out.stat().st_size > 0
    ctx.sql("CREATE TABLE cp2 (id BIGINT, name VARCHAR, score DOUBLE)")
    # extension-based AUTO detection on load
    ctx.sql(f"COPY INTO cp2 FROM '{out}' FILE_FORMAT = (TYPE = CSV)")
    rows = ctx.sql("SELECT id, name, score FROM cp2 ORDER BY id").rows()
    assert rows == [(1, "alpha", 1.5), (2, "beta", 2.5)]


def test_copy_unavailable_codec_errors(ctx, tmp_path):
    with pytest.raises(DatabendError, match="not available"):
        ctx.sql(f"COPY INTO '{tmp_path}/x.csv' FROM cp"
                " FILE_FORMAT = (TYPE = CSV COMPRESSION = BROTLI)")


def test_copy_ndjson(ctx, tmp_path):
    src = tmp_path / "in.ndjson"
    src.write_text(json.dumps({"id": 10, "name": "nd", "score": 9.0}) + "\n"
                   + json.dumps({"id": 11, "name": None, "score": 2.0}) + "\n")
    r = ctx.sql(f"COPY INTO cp FROM '{src}'")
    assert r.affected_rows == 2
    assert ctx.sql("SELECT name FROM cp WHERE id = 11").scalar() is None
    out = tmp_path / "out.ndjson"
    ctx.sql(f"COPY INTO '{out}' FROM (SELECT id FROM cp WHERE id >= 10)")
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert sorted(o["id"] for o in lines) == [10, 11]


def test_copy_parquet_and_pattern(ctx, tmp_path):
    out = tmp_path / "dump.parquet"
    ctx.sql("INSERT INTO cp VALUES (1, 'x', 0.1), (2, 'y', 0.2)")
    ctx.sql(f"COPY INTO '{out}' FROM cp")
    ctx.sql("TRUNCATE TABLE cp")
    assert ctx.sql("SELECT count(*) FROM cp").scalar() == 0
    ctx.sql(f"COPY INTO cp FROM '{out}'")
    assert ctx.sql("SELECT count(*) FROM cp").scalar() == 2

    d = tmp_path / "many"
    d.mkdir()
    (d / "a.csv").write_text("5,p,0.5\n")
    (d / "b.csv").write_text("6,q,0.6\n")
    (d / "skip.txt").write_text("junk\n")
    r = ctx.sql(f"COPY INTO cp FROM '{d}' PATTERN = '*.csv' FILE_FORMAT = (TYPE = CSV)")
    assert r.affected_rows == 2


def test_copy_orc_roundtrip(ctx, tmp_path):
    """ORC load + unload via pyarrow (reference src/query/storages/orc)."""
    ctx.sql("INSERT INTO cp VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5)")
    out = tmp_path / "out.orc"
    ctx.sql(f"COPY INTO '{out}' FROM cp FILE_FORMAT = (TYPE = ORC)")
    ctx.sql("CREATE TABLE cpo (id BIGINT, name VARCHAR, score DOUBLE)")
    ctx.sql(f"COPY INTO cpo FROM '{out}' FILE_FORMAT = (TYPE = ORC)")
    assert ctx.sql("SELECT id, name, score FROM cpo ORDER BY id").rows() == \
        [(1, "alpha", 1.5), (2, "beta", 2.5)]


def test_copy_avro_load(ctx, tmp_path):
    """Avro OCF load via the built-in decoder (no avro lib in the image)."""
    from databend_tpu.formats.avro import read_avro_records, write_avro_records
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"}]}
    src = tmp_path / "in.avro"
    write_avro_records(str(src), schema, [
        {"id": 1, "name": "alpha", "score": 1.5},
        {"id": 2, "name": None, "score": 2.5}])
    # decoder round-trip sanity
    recs = list(read_avro_records(str(src)))
    assert recs[0]["id"] == 1 and recs[1]["name"] is None
    ctx.sql(f"COPY INTO cp FROM '{src}' FILE_FORMAT = (TYPE = AVRO)")
    rows = ctx.sql("SELECT id, name, score FROM cp ORDER BY id").rows()
    assert rows == [(1, "alpha", 1.5), (2, None, 2.5)]


def test_copy_vector_column(tmp_catalog, tmp_path):
    c = tmp_catalog
    c.sql("CREATE TABLE cv (id BIGINT, emb VECTOR(3))")
    src = tmp_path / "v.csv"
    src.write_text('1,"[1.0, 0.0, 0.0]"\n2,"[0.0, 1.0, 0.0]"\n')
    c.sql(f"COPY INTO cv FROM '{src}' FILE_FORMAT = (TYPE = CSV)")
    r = c.sql("SELECT id FROM cv ORDER BY cosine_distance(emb, [1.0,0.0,0.0]) LIMIT 1")
    assert r.rows() == [(1,)]


def test_copy_missing_file_errors(ctx, tmp_path):
    with pytest.raises(DatabendError):
        ctx.sql(f"COPY INTO cp FROM '{tmp_path}/nope.csv'")
