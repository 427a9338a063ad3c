"""Window function tests (OVER with PARTITION BY / ORDER BY)."""

import pytest

from databend_tpu.errors import DatabendError


@pytest.fixture
def ctx(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE w (grp VARCHAR, v BIGINT, f DOUBLE)")
    c.sql("""INSERT INTO w VALUES
        ('a', 1, 1.0), ('a', 2, 2.0), ('a', 2, 3.0), ('a', 4, 4.0),
        ('b', 10, 5.0), ('b', 20, 6.0), ('b', 20, 7.0)""")
    return c


def q(ctx, sql):
    return ctx.sql(sql).rows()


def test_row_number_rank_dense_rank(ctx):
    rows = q(ctx, """SELECT grp, v,
        row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
        rank() OVER (PARTITION BY grp ORDER BY v) AS r,
        dense_rank() OVER (PARTITION BY grp ORDER BY v) AS dr
        FROM w ORDER BY grp, v, rn""")
    a = [r for r in rows if r[0] == "a"]
    assert [r[2] for r in a] == [1, 2, 3, 4]          # row_number
    assert [r[3] for r in a] == [1, 2, 2, 4]          # rank with tie at v=2
    assert [r[4] for r in a] == [1, 2, 2, 3]          # dense_rank
    b = [r for r in rows if r[0] == "b"]
    assert [r[3] for r in b] == [1, 2, 2]


def test_running_sum_and_whole_partition(ctx):
    rows = q(ctx, """SELECT grp, v,
        sum(v) OVER (PARTITION BY grp ORDER BY f) AS running,
        sum(v) OVER (PARTITION BY grp) AS total
        FROM w ORDER BY grp, f""")
    a = [r for r in rows if r[0] == "a"]
    assert [r[2] for r in a] == [1, 3, 5, 9]
    assert [r[3] for r in a] == [9, 9, 9, 9]
    b = [r for r in rows if r[0] == "b"]
    assert [r[3] for r in b] == [50, 50, 50]


def test_range_frame_peers_share_value(ctx):
    # ties on the ORDER BY key are peers: both v=2 rows see the same running sum
    rows = q(ctx, """SELECT grp, v,
        sum(v) OVER (PARTITION BY grp ORDER BY v) AS s
        FROM w WHERE grp = 'a' ORDER BY v""")
    assert [r[2] for r in rows] == [1, 5, 5, 9]


def test_lag_lead_first_last(ctx):
    rows = q(ctx, """SELECT v,
        lag(v) OVER (ORDER BY f) AS lg,
        lead(v, 1, -1) OVER (ORDER BY f) AS ld,
        first_value(v) OVER (ORDER BY f) AS fv
        FROM w WHERE grp = 'b' ORDER BY f""")
    assert [r[1] for r in rows] == [None, 10, 20]
    assert [r[2] for r in rows] == [20, 20, -1]
    assert [r[3] for r in rows] == [10, 10, 10]


def test_ntile_percent_rank_cume_dist(ctx):
    rows = q(ctx, """SELECT v,
        ntile(2) OVER (ORDER BY v) AS nt,
        percent_rank() OVER (ORDER BY v) AS pr,
        cume_dist() OVER (ORDER BY v) AS cd
        FROM w WHERE grp = 'a' ORDER BY v""")
    assert [r[1] for r in rows] == [1, 1, 2, 2]
    assert rows[0][2] == 0.0 and abs(rows[3][2] - 1.0) < 1e-9
    assert abs(rows[3][3] - 1.0) < 1e-9


def test_min_max_avg_count_windows(ctx):
    rows = q(ctx, """SELECT grp, v,
        min(v) OVER (PARTITION BY grp ORDER BY f) AS mn,
        max(v) OVER (PARTITION BY grp ORDER BY f) AS mx,
        avg(v) OVER (PARTITION BY grp) AS av,
        count(*) OVER (PARTITION BY grp) AS c
        FROM w ORDER BY grp, f""")
    a = [r for r in rows if r[0] == "a"]
    assert [r[2] for r in a] == [1, 1, 1, 1]
    assert [r[3] for r in a] == [1, 2, 2, 4]
    assert all(abs(r[4] - 2.25) < 1e-9 for r in a)
    assert all(r[5] == 4 for r in a)


def test_window_over_aggregate(ctx):
    rows = q(ctx, """SELECT grp, sum(v) AS s,
        rank() OVER (ORDER BY sum(v) DESC) AS r
        FROM w GROUP BY grp ORDER BY r""")
    assert rows[0][0] == "b" and rows[0][2] == 1
    assert rows[1][0] == "a" and rows[1][2] == 2


def test_window_errors(ctx):
    with pytest.raises(DatabendError):
        ctx.sql("SELECT v FROM w WHERE row_number() OVER (ORDER BY v) = 1")
    with pytest.raises(DatabendError):
        ctx.sql("SELECT ntile(v) OVER (ORDER BY v) FROM w")
