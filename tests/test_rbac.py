"""RBAC: users, roles, grants, enforcement."""

import pytest

from databend_tpu.errors import DatabendError
from databend_tpu.users import AuthenticateFailure, PermissionDenied


def test_create_user_auth(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE USER alice IDENTIFIED BY 'secret'")
    c.authenticate("alice", "secret")
    assert c.current_user.name == "alice"
    with pytest.raises(AuthenticateFailure):
        c.authenticate("alice", "wrong")
    with pytest.raises(AuthenticateFailure):
        c.authenticate("nobody", "x")
    c.authenticate("root")


def test_privilege_enforcement(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE secret_t (v BIGINT)")
    c.sql("INSERT INTO secret_t VALUES (1)")
    c.sql("CREATE USER bob IDENTIFIED BY 'pw'")
    c.authenticate("bob", "pw")
    with pytest.raises(PermissionDenied):
        c.sql("SELECT * FROM secret_t")
    with pytest.raises(PermissionDenied):
        c.sql("INSERT INTO secret_t VALUES (2)")
    with pytest.raises(PermissionDenied):
        c.sql("CREATE TABLE bob_t (v BIGINT)")
    c.authenticate("root")
    c.sql("GRANT SELECT ON default.secret_t TO bob")
    c.authenticate("bob", "pw")
    assert c.sql("SELECT count(*) FROM secret_t").scalar() == 1
    with pytest.raises(PermissionDenied):
        c.sql("INSERT INTO secret_t VALUES (2)")
    # system tables stay readable
    assert c.sql("SELECT dummy FROM system.one").scalar() == 1
    c.authenticate("root")


def test_roles_and_revoke(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE rt2 (v BIGINT)")
    c.sql("CREATE ROLE analyst")
    c.sql("GRANT SELECT, INSERT ON default.* TO ROLE analyst")
    c.sql("CREATE USER carol IDENTIFIED BY 'pw'")
    c.sql("GRANT ROLE analyst TO carol")
    c.authenticate("carol", "pw")
    c.sql("INSERT INTO rt2 VALUES (5)")
    assert c.sql("SELECT v FROM rt2").rows() == [(5,)]
    c.authenticate("root")
    c.sql("REVOKE SELECT, INSERT ON default.* FROM ROLE analyst")
    c.authenticate("carol", "pw")
    with pytest.raises(PermissionDenied):
        c.sql("SELECT v FROM rt2")
    c.authenticate("root")


def test_show_grants_users_roles(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE USER dave IDENTIFIED BY 'pw'")
    c.sql("GRANT SELECT ON *.* TO dave")
    rows = c.sql("SHOW GRANTS FOR dave").rows()
    assert any("SELECT ON *.*" in r[0] for r in rows)
    rows = c.sql("SHOW GRANTS").rows()  # current user = root
    assert any("ALL" in r[0] for r in rows)
    c.sql("DROP USER dave")
    with pytest.raises(DatabendError):
        c.sql("SHOW GRANTS FOR dave")


def test_privilege_escalation_blocked(tmp_catalog):
    """ADVICE r1: unprivileged users must not manage users/roles/grants."""
    c = tmp_catalog
    c.sql("CREATE USER mallory IDENTIFIED BY 'pw'")
    c.authenticate("mallory", "pw")
    for sql in [
        "GRANT ALL ON *.* TO mallory",
        "CREATE USER eve IDENTIFIED BY 'x'",
        "DROP USER root",
        "CREATE ROLE sneaky",
        "DROP ROLE account_admin",
        "GRANT ROLE account_admin TO mallory",
        "SET GLOBAL max_threads = 1",
        "SHOW GRANTS FOR root",
    ]:
        with pytest.raises(PermissionDenied):
            c.sql(sql)
    c.authenticate("root")


def test_dml_ddl_privilege_gates(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE gated (v BIGINT)")
    c.sql("INSERT INTO gated VALUES (1)")
    c.sql("CREATE USER worker IDENTIFIED BY 'pw'")
    c.sql("GRANT SELECT ON default.gated TO worker")
    c.authenticate("worker", "pw")
    with pytest.raises(PermissionDenied):
        c.sql("TRUNCATE TABLE gated")
    c.authenticate("root")
    c.sql("GRANT DELETE ON default.gated TO worker")
    c.authenticate("worker", "pw")
    c.sql("TRUNCATE TABLE gated")
    assert c.sql("SELECT count(*) FROM gated").scalar() == 0
    c.authenticate("root")


def test_for_user_isolated_identity(tmp_catalog):
    """for_user() views never mutate the parent session's identity."""
    c = tmp_catalog
    c.sql("CREATE USER viewer IDENTIFIED BY 'pw'")
    u = c.users.authenticate("viewer", "pw")
    view = c.for_user(u)
    assert view.current_user.name == "viewer"
    assert c.current_user.name == "root"
    with pytest.raises(PermissionDenied):
        view.sql("CREATE USER another IDENTIFIED BY 'x'")
    # catalog is shared
    c.sql("CREATE TABLE shared_t (v BIGINT)")
    c.sql("GRANT SELECT ON default.shared_t TO viewer")
    assert view.sql("SELECT count(*) FROM shared_t").scalar() == 0
