"""External table engines (reference: src/query/storages/{parquet,hive,delta,orc})."""

import json
import os

import numpy as np
import pytest

from databend_tpu.errors import DatabendError


def _write_parquet(path, ids, names):
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"id": ids, "name": names}), path)


def test_parquet_directory_table(tmp_catalog, tmp_path):
    c = tmp_catalog
    d = tmp_path / "pq"
    _write_parquet(str(d / "a.parquet"), [1, 2], ["a", "b"])
    _write_parquet(str(d / "b.parquet"), [3], ["c"])
    c.sql(f"CREATE TABLE ext (id BIGINT, name VARCHAR) ENGINE=PARQUET"
          f" location='{d}'")
    rows = c.sql("SELECT id, name FROM ext ORDER BY id").rows()
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    assert c.sql("SELECT count(*) FROM ext").scalar() == 3
    # filters + aggregates work through the normal pipeline
    assert c.sql("SELECT sum(id) FROM ext WHERE id > 1").scalar() == 5
    # read-only
    with pytest.raises(DatabendError, match="read-only"):
        c.sql("INSERT INTO ext VALUES (9, 'x')")


def test_hive_partitioned_table(tmp_catalog, tmp_path):
    c = tmp_catalog
    d = tmp_path / "hive"
    _write_parquet(str(d / "dt=2026-01-01" / "p0.parquet"), [1], ["a"])
    _write_parquet(str(d / "dt=2026-01-02" / "p0.parquet"), [2], ["b"])
    c.sql(f"CREATE TABLE hv (id BIGINT, name VARCHAR, dt VARCHAR)"
          f" ENGINE=HIVE location='{d}' format='parquet'")
    rows = c.sql("SELECT id, dt FROM hv ORDER BY id").rows()
    assert rows == [(1, "2026-01-01"), (2, "2026-01-02")]
    # partition pruning on the path column
    from databend_tpu.sql.binder import Binder
    from databend_tpu.sql.parser import parse_sql
    stmt = parse_sql("SELECT id FROM hv WHERE dt = '2026-01-02'")
    plan = Binder(c).bind_query(stmt.query)
    scan = plan
    while not hasattr(scan, "pushdown"):
        scan = scan.children()[0]
    parts, stats = c.table("hv").read_partitions(scan.pushdown)
    assert stats.blocks_before == 2 and stats.blocks_after == 1
    assert c.sql("SELECT id FROM hv WHERE dt = '2026-01-02'").rows() == [(2,)]


def test_delta_table_log_replay(tmp_catalog, tmp_path):
    c = tmp_catalog
    d = tmp_path / "delta"
    log = d / "_delta_log"
    os.makedirs(log)
    _write_parquet(str(d / "part-0.parquet"), [1, 2], ["a", "b"])
    _write_parquet(str(d / "part-1.parquet"), [3], ["c"])
    _write_parquet(str(d / "part-2.parquet"), [4], ["d"])
    (log / "00000000000000000000.json").write_text(
        json.dumps({"add": {"path": "part-0.parquet", "partitionValues": {}}})
        + "\n" + json.dumps({"add": {"path": "part-1.parquet",
                                     "partitionValues": {}}}) + "\n")
    # commit 1: remove part-1, add part-2 (time travel semantics: replay)
    (log / "00000000000000000001.json").write_text(
        json.dumps({"remove": {"path": "part-1.parquet"}}) + "\n"
        + json.dumps({"add": {"path": "part-2.parquet",
                              "partitionValues": {}}}) + "\n")
    c.sql(f"CREATE TABLE dl (id BIGINT, name VARCHAR) ENGINE=DELTA"
          f" location='{d}'")
    rows = c.sql("SELECT id, name FROM dl ORDER BY id").rows()
    assert rows == [(1, "a"), (2, "b"), (4, "d")]  # part-1 removed


def test_orc_external_table(tmp_catalog, tmp_path):
    import pyarrow as pa
    import pyarrow.orc as paorc
    c = tmp_catalog
    d = tmp_path / "orc"
    os.makedirs(d)
    paorc.write_table(pa.table({"id": [7, 8], "name": ["x", "y"]}),
                      str(d / "f.orc"))
    c.sql(f"CREATE TABLE eo (id BIGINT, name VARCHAR) ENGINE=ORC"
          f" location='{d}'")
    assert c.sql("SELECT id FROM eo ORDER BY id").rows() == [(7,), (8,)]


def test_external_join_with_fuse_table(tmp_catalog, tmp_path):
    c = tmp_catalog
    d = tmp_path / "pq2"
    _write_parquet(str(d / "a.parquet"), [1, 2, 3], ["a", "b", "c"])
    c.sql(f"CREATE TABLE dim (id BIGINT, name VARCHAR) ENGINE=PARQUET"
          f" location='{d}'")
    c.sql("CREATE TABLE fact (id BIGINT, v BIGINT)")
    c.sql("INSERT INTO fact VALUES (1, 10), (3, 30), (3, 31)")
    rows = c.sql("SELECT name, sum(v) FROM fact JOIN dim ON fact.id = dim.id"
                 " GROUP BY name ORDER BY name").rows()
    assert rows == [("a", 10), ("c", 61)]
