"""system.* tables over the full SQL surface."""


def test_system_tables_and_columns(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE st (id BIGINT, name VARCHAR)")
    c.sql("INSERT INTO st VALUES (1, 'a'), (2, 'b')")
    rows = c.sql("SELECT database, name, num_rows FROM system.tables"
                 " WHERE name = 'st'").rows()
    assert rows == [("default", "st", 2)]
    cols = c.sql("SELECT name, type FROM system.columns WHERE table = 'st'"
                 " ORDER BY name").rows()
    assert [r[0] for r in cols] == ["id", "name"]


def test_system_one_settings_functions(tmp_catalog):
    c = tmp_catalog
    assert c.sql("SELECT dummy FROM system.one").scalar() == 1
    assert c.sql("SELECT count(*) FROM system.settings").scalar() > 0
    agg = c.sql("SELECT count(*) FROM system.functions WHERE is_aggregate").scalar()
    assert agg >= 5


def test_system_query_log(tmp_catalog):
    c = tmp_catalog
    c.sql("SELECT 1 + 1")
    rows = c.sql("SELECT query_text, query_kind FROM system.query_log").rows()
    assert any("1 + 1" in r[0] for r in rows)
    # failed queries are logged with exception text
    try:
        c.sql("SELECT * FROM no_such_table")
    except Exception:
        pass
    rows = c.sql("SELECT exception_text FROM system.query_log"
                 " WHERE exception_text IS NOT NULL").rows()
    assert len(rows) >= 1


def test_system_caches_metrics_build(tmp_catalog):
    c = tmp_catalog
    assert c.sql("SELECT count(*) FROM system.caches").scalar() == 5
    c.sql("SELECT 1")
    assert c.sql("SELECT count(*) FROM system.metrics").scalar() > 0
    rows = dict(c.sql("SELECT name, value FROM system.build_options").rows())
    assert "jax_version" in rows


def test_system_indexes(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE sv (id INT, emb VECTOR(4))")
    c.sql("CREATE VECTOR INDEX vidx ON sv(emb) distance='cosine'")
    rows = c.sql("SELECT name, type FROM system.indexes WHERE table = 'sv'").rows()
    assert rows == [("vidx", "vector")]


def test_system_tables_tranche2(tmp_catalog):
    """Round-2 widening: >=20 system tables, each selectable."""
    c = tmp_catalog
    from databend_tpu.service.system_tables import SYSTEM_TABLES
    assert len(SYSTEM_TABLES) >= 20
    c.sql("CREATE TABLE st2 (v BIGINT)")
    c.sql("INSERT INTO st2 VALUES (1)")
    c.sql("ANALYZE TABLE st2")
    for name in SYSTEM_TABLES:
        c.sql(f"SELECT * FROM system.{name}")  # must not raise
    assert c.sql("SELECT count(*) FROM system.users").scalar() >= 1
    assert c.sql("SELECT count(*) FROM system.engines").scalar() == 4
    row = c.sql("SELECT ndv, histogram_buckets FROM system.statistics"
                " WHERE table = 'st2' AND column = 'v'").rows()
    assert row and row[0][0] >= 1.0


def test_show_create_table(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE sct (id BIGINT, emb VECTOR(4))")
    c.sql("CREATE VECTOR INDEX scti ON sct(emb) distance='cosine'")
    ddl = c.sql("SHOW CREATE TABLE sct").rows()[0][1]
    assert "CREATE TABLE sct" in ddl
    assert "VECTOR(4)" in ddl
    assert "CREATE VECTOR INDEX scti" in ddl


def test_set_global_persists(tmp_path):
    from databend_tpu.service.session import SessionContext
    c = SessionContext(data_root=str(tmp_path))
    c.sql("SET GLOBAL max_threads = 3")
    c.meta.close()
    c2 = SessionContext(data_root=str(tmp_path))
    assert c2.settings.get("max_threads") == 3


def test_show_fallback_and_like_and_table_ddl(tmp_path):
    """SHOW <word> falls back to the matching system table; CREATE TABLE
    LIKE; ALTER TABLE COMMENT; SHOW VARIABLES alias."""
    from databend_tpu import SessionContext
    ctx = SessionContext(data_root=str(tmp_path / "sf"))
    assert ctx.sql("SHOW USERS").rows()[0][0] == "root"
    assert any(r[0] == "FUSE" for r in ctx.sql("SHOW ENGINES").rows())
    assert ctx.sql("SHOW VARIABLES LIKE 'max_threads'").rows()[0][0] \
        == "max_threads"
    ctx.sql("CREATE TABLE src (a INT NOT NULL, b VARCHAR) CLUSTER BY (a)")
    ctx.sql("CREATE TABLE dup LIKE src")
    info = ctx.catalog.get_table("default", "dup")
    assert [f.name for f in info.schema.fields] == ["a", "b"]
    assert info.cluster_by == ["a"]
    ctx.sql("ALTER TABLE src COMMENT = 'hello'")
    assert ctx.catalog.get_table("default", "src").options["comment"] == "hello"
    assert ctx.sql("SELECT current_catalog()").rows() == [("default",)]
