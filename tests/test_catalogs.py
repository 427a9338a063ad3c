"""Multiple catalogs (VERDICT r3 item 7): CREATE CATALOG TYPE=ICEBERG over
a filesystem warehouse root; 3-part name resolution; listing."""

import os

import pytest

from databend_tpu.errors import DatabendError
from databend_tpu.service.session import SessionContext

from test_iceberg import write_iceberg_table


@pytest.fixture
def ctx(tmp_path):
    c = SessionContext(str(tmp_path / "dr"))
    yield c
    c.close()


def _warehouse(tmp_path):
    root = tmp_path / "wh"
    write_iceberg_table(str(root / "sales" / "orders"), {
        "f1.parquet": [(1, "a", 1.5), (2, "b", 2.5)],
    })
    write_iceberg_table(str(root / "sales" / "items"), {
        "f1.parquet": [(7, "x", 0.5)],
    })
    write_iceberg_table(str(root / "hr" / "people"), {
        "f1.parquet": [(9, "z", 9.9)],
    })
    return str(root)


def test_create_catalog_and_three_part_select(ctx, tmp_path):
    root = _warehouse(tmp_path)
    ctx.sql(f"CREATE CATALOG ic TYPE=ICEBERG LOCATION='{root}'")
    rows = ctx.sql("SELECT id, name FROM ic.sales.orders ORDER BY id").rows()
    assert rows == [(1, "a"), (2, "b")]
    # joins across catalogs work like any table ref
    assert ctx.sql("SELECT count(*) FROM ic.sales.orders o, "
                   "ic.hr.people p").rows() == [(2,)]
    # aggregate with filter pushdown
    assert ctx.sql("SELECT sum(score) FROM ic.sales.orders WHERE id > 1"
                   ).rows() == [(2.5,)]


def test_show_and_drop_catalog(ctx, tmp_path):
    root = _warehouse(tmp_path)
    ctx.sql(f"CREATE CATALOG ic TYPE=ICEBERG CONNECTION=(URL='{root}')")
    cats = ctx.sql("SHOW CATALOGS").rows()
    assert ("default", "DEFAULT") in cats and ("ic", "ICEBERG") in cats
    assert ctx.catalog_databases("ic") == ["hr", "sales"]
    assert ctx.catalog_tables("ic", "sales") == ["items", "orders"]
    ctx.sql("DROP CATALOG ic")
    with pytest.raises(DatabendError):
        ctx.sql("SELECT * FROM ic.sales.orders")
    with pytest.raises(DatabendError):
        ctx.sql("DROP CATALOG ic")
    ctx.sql("DROP CATALOG IF EXISTS ic")


def test_catalog_errors(ctx, tmp_path):
    root = _warehouse(tmp_path)
    ctx.sql(f"CREATE CATALOG ic TYPE=ICEBERG LOCATION='{root}'")
    with pytest.raises(DatabendError):
        ctx.sql(f"CREATE CATALOG ic TYPE=ICEBERG LOCATION='{root}'")
    ctx.sql(f"CREATE CATALOG IF NOT EXISTS ic TYPE=ICEBERG LOCATION='{root}'")
    with pytest.raises(DatabendError):
        ctx.sql("SELECT * FROM ic.sales.nope")
    with pytest.raises(DatabendError):
        ctx.sql("SELECT * FROM nocat.sales.orders")
