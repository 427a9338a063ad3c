"""Round-3 compat tranche: warehouses, LZ4 codec, full settings surface,
remaining system tables (VERDICT r2 item 7)."""

import numpy as np
import pytest

from databend_tpu.errors import BadArguments


def test_warehouse_lifecycle(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE WAREHOUSE wh1 WITH warehouse_size = 'Medium'")
    ctx.sql("CREATE WAREHOUSE IF NOT EXISTS wh1")
    with pytest.raises(BadArguments):
        ctx.sql("CREATE WAREHOUSE wh1")
    rows = ctx.sql("SHOW WAREHOUSES").rows()
    assert rows == [("wh1", "Standard", "Running", "Medium")]
    ctx.sql("ALTER WAREHOUSE wh1 SUSPEND")
    assert ctx.sql("SHOW WAREHOUSES").rows()[0][2] == "Suspended"
    ctx.sql("ALTER WAREHOUSE wh1 RESUME")
    ctx.sql("USE WAREHOUSE wh1")
    assert ctx.current_warehouse == "wh1"
    ctx.sql("DROP WAREHOUSE wh1")
    assert ctx.sql("SHOW WAREHOUSES").rows() == []
    ctx.sql("DROP WAREHOUSE IF EXISTS wh1")


def test_task_warehouse_affinity(tmp_catalog):
    ctx = tmp_catalog
    ctx.sql("CREATE WAREHOUSE aff1")
    with pytest.raises(BadArguments):
        ctx.sql("CREATE TASK bad_t WAREHOUSE = 'nope'"
                " SCHEDULE = 60 SECOND AS SELECT 1")
    ctx.sql("CREATE TASK good_t WAREHOUSE = 'aff1'"
            " SCHEDULE = 60 SECOND AS SELECT 1")


def test_lz4_roundtrip_and_copy(tmp_catalog):
    from databend_tpu.formats import lz4
    rng = np.random.default_rng(0)
    for data in (b"", b"x", b"ab" * 50_000, bytes(rng.integers(0, 256, 10_000,
                                                              np.uint8))):
        assert lz4.decompress(lz4.compress(data)) == data
    # real LZ4 block with a back-reference match decodes
    blk = bytes([0x35]) + b"abc" + bytes([3, 0]) + bytes([0x10]) + b"d"
    assert lz4._decompress_block(blk) == b"abcabcabcabcd"
    ctx = tmp_catalog
    ctx.sql("CREATE STAGE lzst")
    ctx.stages.put_bytes("@lzst", "d.csv.lz4", lz4.compress(b"1,x\n2,y\n"))
    ctx.sql("CREATE TABLE lz_t (a INT, b VARCHAR)")
    ctx.sql("COPY INTO lz_t FROM @lzst FILE_FORMAT = (type = 'CSV')")
    assert ctx.sql("SELECT * FROM lz_t ORDER BY a").to_pydict() == {
        "a": [1, 2], "b": ["x", "y"]}


def test_settings_parity_count(tmp_catalog):
    """Reference settings_default.rs defines ~221 settings; all of its
    extractable names must be present (plus engine-specific extras)."""
    from databend_tpu.settings import DEFAULT_SETTINGS
    assert len(DEFAULT_SETTINGS) >= 219
    for probe in ("enable_dio", "flight_client_keep_alive_time_secs",
                  "force_aggregate_shuffle_mode", "use_parquet2",
                  "spilling_to_disk_vacuum_unknown_temp_dirs_limit"):
        assert probe in DEFAULT_SETTINGS, probe
    # settable + visible through SHOW SETTINGS
    ctx = tmp_catalog
    ctx.sql("SET enable_dio = 1")
    rows = {r[0]: r[1] for r in ctx.sql("SHOW SETTINGS").rows()}
    assert rows["enable_dio"] in ("1", "True", "true")


def test_new_system_tables(tmp_catalog):
    ctx = tmp_catalog
    for t in ("constraints", "malloc_stats_totals", "notifications",
              "notification_history", "tags", "virtual_columns"):
        ctx.sql(f"SELECT * FROM system.{t}")  # present + queryable
    n = ctx.sql("SELECT count(*) FROM system.malloc_stats_totals").rows()
    assert n[0][0] >= 3
