"""EE surfaces: masking policies, row access policies, ATTACH TABLE,
license gating, and ALTER TABLE column DDL (add/drop/rename).

Reference: src/query/ee_features/{data_mask,...}, attach_table,
src/common/license (Feature gating), ALTER TABLE column interpreters.
"""

import pytest

from databend_tpu import SessionContext
from databend_tpu.errors import LicenseKeyInvalid


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


# ------------------------------------------------------------- column DDL
def test_add_column_backfills(ctx):
    ctx.sql("CREATE TABLE t (id INT)")
    ctx.sql("INSERT INTO t VALUES (1), (2)")
    ctx.sql("ALTER TABLE t ADD COLUMN v INT DEFAULT 7")
    ctx.sql("ALTER TABLE t ADD COLUMN s VARCHAR")
    ctx.sql("INSERT INTO t VALUES (3, 30, 'x')")
    rows = ctx.sql("SELECT id, v, s FROM t ORDER BY id").rows()
    assert rows == [(1, 7, None), (2, 7, None), (3, 30, "x")]
    # aggregate over mixed old/new blocks
    assert ctx.sql("SELECT sum(v) FROM t").rows() == [(44,)]


def test_drop_column(ctx):
    ctx.sql("CREATE TABLE t (id INT, junk INT)")
    ctx.sql("INSERT INTO t VALUES (1, 9)")
    ctx.sql("ALTER TABLE t DROP COLUMN junk")
    assert ctx.sql("SELECT * FROM t").rows() == [(1,)]
    with pytest.raises(Exception):
        ctx.sql("SELECT junk FROM t")
    with pytest.raises(Exception):
        ctx.sql("ALTER TABLE t DROP COLUMN id")  # last column


def test_rename_column_reads_old_blocks(ctx):
    ctx.sql("CREATE TABLE t (id INT, old_name INT)")
    ctx.sql("INSERT INTO t VALUES (1, 10)")
    ctx.sql("ALTER TABLE t RENAME COLUMN old_name TO new_name")
    # old block resolves through prior_names
    assert ctx.sql("SELECT new_name FROM t").rows() == [(10,)]
    ctx.sql("INSERT INTO t VALUES (2, 20)")
    rows = ctx.sql("SELECT id, new_name FROM t ORDER BY id").rows()
    assert rows == [(1, 10), (2, 20)]
    with pytest.raises(Exception):
        ctx.sql("SELECT old_name FROM t")


def test_add_column_after_block_cached(ctx):
    """Regression: the decoded-block cache must not serve blocks read
    under the pre-ALTER schema (cache key carries a schema fingerprint)."""
    ctx.sql("CREATE TABLE cached (id INT, emb VECTOR(4))")
    ctx.sql("INSERT INTO cached VALUES (1, [1.0,0.0,0.0,0.0])")
    # populate the block cache under the old schema
    assert ctx.sql("SELECT id FROM cached").rows() == [(1,)]
    ctx.sql("ALTER TABLE cached ADD COLUMN score INT DEFAULT 5")
    rows = ctx.sql("SELECT id, score FROM cached ORDER BY"
                   " l2_distance(emb, [1.0,0.0,0.0,0.0]) LIMIT 1").rows()
    assert rows == [(1, 5)]


# ------------------------------------------------------------ masking
def test_masking_policy_applies(ctx):
    ctx.sql("CREATE MASKING POLICY hide_email AS (val STRING) RETURNS STRING"
            " -> CASE WHEN current_role() = 'account_admin' THEN val"
            " ELSE '*****' END")
    ctx.sql("CREATE TABLE users_t (id INT, email VARCHAR)")
    ctx.sql("INSERT INTO users_t VALUES (1, 'a@x.com')")
    ctx.sql("ALTER TABLE users_t MODIFY COLUMN email SET MASKING POLICY hide_email")
    # root's current_role() is account_admin -> unmasked
    assert ctx.sql("SELECT email FROM users_t").rows() == [("a@x.com",)]
    # a plain user sees the mask
    ctx.sql("CREATE USER bob IDENTIFIED BY 'pw'")
    ctx.sql("GRANT SELECT ON *.* TO bob")
    bob = ctx.for_user(ctx.users.get_user("bob"))
    assert bob.sql("SELECT email FROM users_t").rows() == [("*****",)]
    # mask applies in predicates too (masked data never leaves the scan)
    assert bob.sql("SELECT count(*) FROM users_t WHERE email = 'a@x.com'").rows() == [(0,)]
    ctx.sql("ALTER TABLE users_t MODIFY COLUMN email UNSET MASKING POLICY")
    assert bob.sql("SELECT email FROM users_t").rows() == [("a@x.com",)]


def test_masking_policy_desc_and_drop(ctx):
    ctx.sql("CREATE MASKING POLICY m1 AS (v STRING) RETURNS STRING -> '***'")
    d = ctx.sql("DESC MASKING POLICY m1").to_pydict()
    assert d["signature"] == ["(v STRING)"]
    assert "'***'" in d["body"][0]
    ctx.sql("DROP MASKING POLICY m1")
    with pytest.raises(Exception):
        ctx.sql("DESC MASKING POLICY m1")


# ------------------------------------------------------- row access policy
def test_row_access_policy(ctx):
    ctx.sql("CREATE ROW ACCESS POLICY only_big AS (amount INT) RETURNS"
            " BOOLEAN -> amount >= 100")
    ctx.sql("CREATE TABLE sales (id INT, amount INT)")
    ctx.sql("INSERT INTO sales VALUES (1, 50), (2, 100), (3, 150)")
    ctx.sql("ALTER TABLE sales ADD ROW ACCESS POLICY only_big ON (amount)")
    assert [r[0] for r in ctx.sql("SELECT id FROM sales ORDER BY id").rows()] \
        == [2, 3]
    assert ctx.sql("SELECT count(*) FROM sales").rows() == [(2,)]
    ctx.sql("ALTER TABLE sales DROP ROW ACCESS POLICY only_big")
    assert ctx.sql("SELECT count(*) FROM sales").rows() == [(3,)]


# -------------------------------------------------------------- attach
def test_attach_table(ctx, tmp_path):
    ctx.sql("CREATE TABLE src (id INT, v VARCHAR)")
    ctx.sql("INSERT INTO src VALUES (1, 'a'), (2, 'b')")
    loc = ctx.table("src").table_dir
    ctx.sql(f"ATTACH TABLE att '{loc}'")
    assert ctx.sql("SELECT count(*) FROM att").rows() == [(2,)]
    # live view: source writes become visible
    ctx.sql("INSERT INTO src VALUES (3, 'c')")
    assert ctx.sql("SELECT count(*) FROM att").rows() == [(3,)]
    # read-only
    with pytest.raises(Exception):
        ctx.sql("INSERT INTO att VALUES (9, 'z')")
    with pytest.raises(Exception):
        ctx.sql("DELETE FROM att WHERE id = 1")


# -------------------------------------------------------------- license
def test_license_gating(ctx):
    ctx.sql("CREATE TABLE lt (v INT)")
    ctx.sql("INSERT INTO lt VALUES (1)")
    ctx.sql("VACUUM TABLE lt")  # dev license covers vacuum
    ctx.sql("SET enterprise_license = ''")
    with pytest.raises(LicenseKeyInvalid):
        ctx.sql("VACUUM TABLE lt")
    with pytest.raises(LicenseKeyInvalid):
        ctx.sql("CREATE MASKING POLICY nope AS (v STRING) RETURNS STRING -> '*'")
    # feature allowlist license
    ctx.sql("SET enterprise_license = 'vacuum'")
    ctx.sql("VACUUM TABLE lt")
    with pytest.raises(LicenseKeyInvalid):
        ctx.sql(f"ATTACH TABLE nope2 '/tmp/nope'")
    ctx.sql("SET enterprise_license = 'builtin-dev'")
