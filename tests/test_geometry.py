"""GEOMETRY type, geo functions, spatial block pruning."""

import pytest


def test_point_functions(tmp_catalog):
    c = tmp_catalog
    assert c.sql("SELECT st_x(st_makepoint(3.5, -2.0))").scalar() == 3.5
    assert c.sql("SELECT st_y(st_makepoint(3.5, -2.0))").scalar() == -2.0
    assert c.sql("SELECT st_distance(st_makepoint(0.0,0.0), st_makepoint(3.0,4.0))").scalar() == 5.0
    assert c.sql("SELECT st_aswkt(st_makepoint(1.0, 2.0))").scalar() == "POINT(1 2)"
    # berlin -> paris great-circle, km
    hv = c.sql("SELECT haversine(52.52, 13.40, 48.85, 2.35)").scalar()
    assert 850 < hv < 900


def test_geometry_column_and_bbox(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE gt (id BIGINT, loc GEOMETRY)")
    c.sql("INSERT INTO gt VALUES (1, 'POINT(1 1)'), (2, 'POINT(9 9)'), (3, NULL)")
    rows = c.sql("SELECT id FROM gt WHERE st_within_bbox(loc, 0.0, 0.0, 5.0, 5.0)").rows()
    assert rows == [(1,)]
    rows = c.sql("SELECT st_x(loc) FROM gt WHERE id = 2").rows()
    assert rows == [(9.0,)]


def test_spatial_block_pruning(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE sp2 (id BIGINT, loc GEOMETRY) ROW_PER_BLOCK='2'")
    c.sql("""INSERT INTO sp2 VALUES
        (1, 'POINT(0 0)'), (2, 'POINT(1 1)'),
        (3, 'POINT(100 100)'), (4, 'POINT(101 101)')""")
    r = c.sql("EXPLAIN ANALYZE SELECT id FROM sp2"
              " WHERE st_within_bbox(loc, 99.0, 99.0, 200.0, 200.0)")
    txt = "\n".join(x[0] for x in r.rows())
    rows = c.sql("SELECT id FROM sp2"
                 " WHERE st_within_bbox(loc, 99.0, 99.0, 200.0, 200.0)"
                 " ORDER BY id").rows()
    assert [x[0] for x in rows] == [3, 4]
    # pruning stats show only one block scanned
    assert "blocks 2->1" in txt or "bloom 1" in txt
