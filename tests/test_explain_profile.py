"""EXPLAIN ANALYZE per-operator profiles."""


def test_explain_analyze_profiles(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ep (v BIGINT)")
    c.sql("INSERT INTO ep VALUES (1), (2), (3)")
    r = c.sql("EXPLAIN ANALYZE SELECT v FROM ep WHERE v > 1 ORDER BY v")
    txt = "\n".join(x[0] for x in r.rows())
    assert "rows: 2" in txt
    assert "self:" in txt and "total:" in txt
    assert "-- executed in" in txt


def test_plain_explain_has_no_profile(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ep2 (v BIGINT)")
    r = c.sql("EXPLAIN SELECT v FROM ep2")
    txt = "\n".join(x[0] for x in r.rows())
    assert "total:" not in txt
