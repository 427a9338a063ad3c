"""ROWS BETWEEN window frames."""

import pytest


@pytest.fixture
def ctx(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE wf (g VARCHAR, v BIGINT)")
    c.sql("INSERT INTO wf VALUES ('a',1),('a',2),('a',3),('a',4),('b',10),('b',20)")
    return c


def test_moving_sum(ctx):
    rows = ctx.sql("""SELECT g, v,
        sum(v) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        FROM wf ORDER BY g, v""").rows()
    a = [r[2] for r in rows if r[0] == "a"]
    assert a == [1, 3, 5, 7]
    b = [r[2] for r in rows if r[0] == "b"]
    assert b == [10, 30]


def test_centered_avg_and_count(ctx):
    rows = ctx.sql("""SELECT v,
        avg(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS m,
        count(*) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c
        FROM wf WHERE g = 'a' ORDER BY v""").rows()
    assert [r[2] for r in rows] == [2, 3, 3, 2]
    assert abs(rows[1][1] - 2.0) < 1e-9
    assert abs(rows[0][1] - 1.5) < 1e-9


def test_rows_unbounded_to_current_is_row_based(ctx):
    # unlike the default RANGE frame, ROWS does not share values among peers
    ctx.sql("INSERT INTO wf VALUES ('c', 5), ('c', 5)")
    rows = ctx.sql("""SELECT v,
        sum(v) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM wf WHERE g = 'c' ORDER BY s""").rows()
    assert [r[1] for r in rows] == [5, 10]


def test_min_max_sliding(ctx):
    rows = ctx.sql("""SELECT v,
        min(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mn,
        max(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mx
        FROM wf WHERE g = 'a' ORDER BY v""").rows()
    assert [r[1] for r in rows] == [1, 1, 2, 3]
    assert [r[2] for r in rows] == [2, 3, 4, 4]


def test_frame_following_only(ctx):
    rows = ctx.sql("""SELECT v,
        sum(v) OVER (ORDER BY v ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s
        FROM wf WHERE g = 'a' ORDER BY v""").rows()
    assert [r[1] for r in rows] == [10, 9, 7, 4]
