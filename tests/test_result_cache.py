"""Query result cache + information_schema aliases."""


def test_result_cache_hit_and_invalidation(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE rc (v BIGINT)")
    c.sql("INSERT INTO rc VALUES (1), (2)")
    c.sql("SET query_result_cache_ttl_secs = 300")
    from databend_tpu.utils.metrics import METRICS
    before = METRICS.snapshot().get("result_cache_hits", 0)
    assert c.sql("SELECT sum(v) FROM rc").scalar() == 3
    assert c.sql("SELECT sum(v) FROM rc").scalar() == 3
    assert METRICS.snapshot().get("result_cache_hits", 0) == before + 1
    # a write changes the snapshot -> different key -> no stale result
    c.sql("INSERT INTO rc VALUES (10)")
    assert c.sql("SELECT sum(v) FROM rc").scalar() == 13


def test_cache_off_by_default(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE rc2 (v BIGINT)")
    c.sql("INSERT INTO rc2 VALUES (1)")
    from databend_tpu.utils.metrics import METRICS
    before = METRICS.snapshot().get("result_cache_hits", 0)
    c.sql("SELECT v FROM rc2")
    c.sql("SELECT v FROM rc2")
    assert METRICS.snapshot().get("result_cache_hits", 0) == before


def test_information_schema(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE isch (a INT, b VARCHAR)")
    rows = c.sql("SELECT name FROM information_schema.tables WHERE name = 'isch'").rows()
    assert rows == [("isch",)]
    cols = c.sql("SELECT name FROM information_schema.columns"
                 " WHERE table = 'isch' ORDER BY name").rows()
    assert [r[0] for r in cols] == ["a", "b"]
    dbs = c.sql("SELECT count(*) FROM information_schema.schemata").scalar()
    assert dbs >= 1


def test_cache_keyed_on_current_database(tmp_catalog):
    """ADVICE r1: same SQL in a different current database is a miss."""
    c = tmp_catalog
    c.sql("SET query_result_cache_ttl_secs = 300")
    c.sql("CREATE DATABASE db_a")
    c.sql("CREATE DATABASE db_b")
    c.sql("USE db_a")
    c.sql("CREATE TABLE t (v BIGINT)")
    c.sql("INSERT INTO t VALUES (1)")
    c.sql("USE db_b")
    c.sql("CREATE TABLE t (v BIGINT)")
    c.sql("INSERT INTO t VALUES (2)")
    c.sql("USE db_a")
    assert c.sql("SELECT v FROM t").rows() == [(1,)]
    c.sql("USE db_b")
    assert c.sql("SELECT v FROM t").rows() == [(2,)]


def test_nondeterministic_not_cached(tmp_catalog):
    c = tmp_catalog
    c.sql("SET query_result_cache_ttl_secs = 300")
    import time
    a = c.sql("SELECT now()").scalar()
    time.sleep(0.01)
    b = c.sql("SELECT now()").scalar()
    assert a != b
