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


def test_trace_spans(tmp_catalog):
    """parse/bind/optimize/execute spans land in system.trace_spans
    (reference: fastrace spans on the query path, planner.rs:98)."""
    c = tmp_catalog
    c.sql("CREATE TABLE ts (v BIGINT)")
    c.sql("INSERT INTO ts VALUES (1), (2)")
    c.sql("SELECT sum(v) FROM ts")
    rows = c.sql("SELECT query_id, name, duration_ms FROM system.trace_spans"
                 " WHERE name IN ('parse', 'bind', 'optimize', 'execute')").rows()
    names = {r[1] for r in rows}
    assert {"parse", "bind", "optimize", "execute"} <= names
    assert all(r[2] >= 0.0 for r in rows)
    # spans carry the query id of the statement that produced them
    qids = {r[0] for r in rows if r[1] == "execute"}
    assert all(q.startswith("q") for q in qids)
