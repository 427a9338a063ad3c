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
