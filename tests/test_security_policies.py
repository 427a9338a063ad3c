"""Network policies, password policies, ALTER USER.

Reference: src/query/users/src/{network_policy,password_policy}.rs and the
auth manager enforcement.
"""

import pytest

from databend_tpu import SessionContext
from databend_tpu.users import AuthenticateFailure


@pytest.fixture()
def ctx(tmp_path):
    return SessionContext(data_root=str(tmp_path / "dr"))


def test_network_policy_crud(ctx):
    ctx.sql("CREATE NETWORK POLICY np ALLOWED_IP_LIST = ('10.0.0.0/8')"
            " BLOCKED_IP_LIST = ('10.9.0.0/16') COMMENT = 'office'")
    d = ctx.sql("DESC NETWORK POLICY np").to_pydict()
    assert d["allowed_ip_list"] == ["10.0.0.0/8"]
    rows = ctx.sql("SHOW NETWORK POLICIES").rows()
    assert rows[0][0] == "np"
    assert ctx.sql("SELECT name FROM system.network_policies").rows() == [("np",)]
    with pytest.raises(Exception):
        ctx.sql("CREATE NETWORK POLICY bad ALLOWED_IP_LIST = ('999.1.1.1')")


def test_network_policy_enforced(ctx):
    ctx.sql("CREATE NETWORK POLICY office ALLOWED_IP_LIST = ('192.168.1.0/24')")
    ctx.sql("CREATE USER alice IDENTIFIED BY 'pw'")
    ctx.sql("ALTER USER alice WITH SET NETWORK POLICY = 'office'")
    # in-range IP authenticates
    ctx.users.authenticate("alice", "pw", client_ip="192.168.1.5")
    with pytest.raises(AuthenticateFailure):
        ctx.users.authenticate("alice", "pw", client_ip="8.8.8.8")
    # no client_ip (embedded use) passes
    ctx.users.authenticate("alice", "pw")
    # policy in use cannot be dropped
    with pytest.raises(Exception):
        ctx.sql("DROP NETWORK POLICY office")
    ctx.sql("ALTER USER alice UNSET NETWORK POLICY")
    ctx.sql("DROP NETWORK POLICY office")


def test_blocked_list_wins(ctx):
    ctx.sql("CREATE NETWORK POLICY b ALLOWED_IP_LIST = ('10.0.0.0/8')"
            " BLOCKED_IP_LIST = ('10.5.0.0/16')")
    ctx.sql("CREATE USER bob IDENTIFIED BY 'x'")
    ctx.sql("ALTER USER bob WITH SET NETWORK POLICY = 'b'")
    ctx.users.authenticate("bob", "x", client_ip="10.1.0.1")
    with pytest.raises(AuthenticateFailure):
        ctx.users.authenticate("bob", "x", client_ip="10.5.3.3")


def test_password_policy(ctx):
    ctx.sql("CREATE PASSWORD POLICY strong PASSWORD_MIN_LENGTH = 8"
            " PASSWORD_MIN_UPPER_CASE_CHARS = 1"
            " PASSWORD_MIN_NUMERIC_CHARS = 1")
    d = ctx.sql("DESC PASSWORD POLICY strong").to_pydict()
    assert d["min_length"] == ["8"]
    ctx.sql("CREATE USER carol IDENTIFIED BY 'weak'")
    ctx.sql("ALTER USER carol WITH SET PASSWORD POLICY = 'strong'")
    with pytest.raises(AuthenticateFailure):
        ctx.sql("ALTER USER carol IDENTIFIED BY 'short'")
    with pytest.raises(AuthenticateFailure):
        ctx.sql("ALTER USER carol IDENTIFIED BY 'longenoughbutweak'")
    ctx.sql("ALTER USER carol IDENTIFIED BY 'Str0ngPass'")
    ctx.users.authenticate("carol", "Str0ngPass")
    assert ctx.sql("SELECT name FROM system.password_policies").rows() \
        == [("strong",)]


def test_alter_user_password_self(ctx):
    ctx.sql("CREATE USER dan IDENTIFIED BY 'old'")
    ctx.sql("GRANT SELECT ON *.* TO dan")
    dan = ctx.for_user(ctx.users.get_user("dan"))
    dan.sql("ALTER USER dan IDENTIFIED BY 'new'")
    ctx.users.authenticate("dan", "new")
    # a plain user cannot alter others
    with pytest.raises(Exception):
        dan.sql("ALTER USER root IDENTIFIED BY 'hax'")
