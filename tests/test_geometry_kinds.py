"""Richer geometry kinds: LINESTRING/POLYGON/MULTI*/GEOMETRYCOLLECTION WKT
round-trip + measures + predicates.

Reference: src/query/functions/src/scalars/geometry.rs (geozero-backed).
"""

import pytest

from databend_tpu import SessionContext
from databend_tpu.expression import geometry as G


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def q1(ctx, sql):
    rows = ctx.sql(sql).rows()
    assert len(rows) == 1
    return rows[0]


# ----------------------------------------------------------------- core
def test_wkt_roundtrip_all_kinds():
    wkts = [
        "POINT(1 2)",
        "LINESTRING(0 0, 1 1, 2 0)",
        "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT(0 0, 1 1)",
        "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
        "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1))",
    ]
    for w in wkts:
        k, c = G.parse_wkt(w)
        k2, c2 = G.parse_wkt(G.to_wkt(k, c))
        assert (k2, c2) == (k, c), w


def test_core_measures():
    k, c = G.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert G.area(k, c) == pytest.approx(15.0)  # 16 minus 1 hole
    assert G.length(k, c) == pytest.approx(16 + 4)
    k, c = G.parse_wkt("LINESTRING(0 0, 3 4)")
    assert G.length(k, c) == pytest.approx(5.0)
    assert G.bbox(k, c) == (0, 0, 3, 4)


def test_core_predicates():
    poly = G.parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    hole = G.parse_wkt(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    pin = G.parse_wkt("POINT(5 5)")
    pout = G.parse_wkt("POINT(15 5)")
    assert G.contains(*poly, *pin)
    assert not G.contains(*poly, *pout)
    assert not G.contains(*hole, *pin)  # inside the hole
    line_cross = G.parse_wkt("LINESTRING(-1 5, 11 5)")
    assert G.intersects(*poly, *line_cross)
    far = G.parse_wkt("LINESTRING(20 20, 30 30)")
    assert not G.intersects(*poly, *far)
    assert G.distance(*pout, *poly) == pytest.approx(5.0)


# ------------------------------------------------------------------ SQL
def test_sql_geometry_functions(ctx):
    assert q1(ctx, "SELECT st_geometrytype(to_geometry('LINESTRING(0 0, 1 1)'))") \
        == ("LINESTRING",)
    assert q1(ctx, "SELECT st_npoints(to_geometry('POLYGON((0 0, 1 0, 1 1, 0 0))'))") \
        == (4.0,)
    assert q1(ctx, "SELECT st_area(to_geometry('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'))") \
        == (16.0,)
    assert q1(ctx, "SELECT st_length(to_geometry('LINESTRING(0 0, 3 4)'))") == (5.0,)
    assert q1(ctx, "SELECT st_perimeter(to_geometry('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'))") \
        == (8.0,)
    assert q1(ctx, "SELECT st_dimension(to_geometry('MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)))'))") \
        == (2.0,)
    assert q1(ctx, "SELECT st_astext(st_centroid(to_geometry('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))')))") \
        == ("POINT(1 1)",)
    assert q1(ctx, "SELECT st_xmin(to_geometry('LINESTRING(1 2, 5 7)')),"
                   " st_ymax(to_geometry('LINESTRING(1 2, 5 7)'))") == (1.0, 7.0)


def test_sql_geometry_predicates(ctx):
    assert q1(ctx, "SELECT st_contains(to_geometry('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))'),"
                   " st_makepoint(5, 5))") == (True,)
    assert q1(ctx, "SELECT st_within(st_makepoint(5, 5),"
                   " to_geometry('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))'))") == (True,)
    assert q1(ctx, "SELECT st_intersects(to_geometry('LINESTRING(0 0, 10 10)'),"
                   " to_geometry('LINESTRING(0 10, 10 0)'))") == (True,)
    assert q1(ctx, "SELECT st_intersects(to_geometry('LINESTRING(0 0, 1 1)'),"
                   " to_geometry('LINESTRING(5 5, 6 6)'))") == (False,)
    assert q1(ctx, "SELECT st_distance(to_geometry('POINT(0 10)'),"
                   " to_geometry('LINESTRING(0 0, 10 0)'))") == (10.0,)


def test_sql_constructors(ctx):
    assert q1(ctx, "SELECT st_astext(st_makeline(st_makepoint(0,0), st_makepoint(1,1)))") \
        == ("LINESTRING(0 0, 1 1)",)
    assert q1(ctx, "SELECT st_astext(st_makepolygon(to_geometry('LINESTRING(0 0, 1 0, 1 1, 0 0)')))") \
        == ("POLYGON((0 0, 1 0, 1 1, 0 0))",)


def test_spatial_pruning_nonpoint(ctx, tmp_path):
    """Blocks of polygons prune on WKT bbox stats."""
    c = SessionContext(data_root=str(tmp_path / "geo"))
    c.sql("CREATE TABLE shapes (id INT, g GEOMETRY) row_per_block=2")
    c.sql("INSERT INTO shapes VALUES"
          " (1, 'POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'),"
          " (2, 'POLYGON((2 2, 3 2, 3 3, 2 3, 2 2))'),"
          " (3, 'POLYGON((100 100, 101 100, 101 101, 100 101, 100 100))'),"
          " (4, 'POLYGON((200 200, 201 200, 201 201, 200 201, 200 200))')")
    rows = c.sql("SELECT id FROM shapes WHERE"
                 " st_within_bbox(g, 0, 0, 10, 10) ORDER BY id").rows()
    assert [r[0] for r in rows] == [1, 2]
