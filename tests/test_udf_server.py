"""External UDF server (VERDICT r3 item 7): CREATE FUNCTION ... LANGUAGE
python HANDLER=... ADDRESS=... evaluated over Arrow Flight do_exchange
against an in-process server (reference udf_server suites)."""

import numpy as np
import pytest

from databend_tpu.errors import SemanticError, UDFServerError
from databend_tpu.service.session import SessionContext
from databend_tpu.testing.udf_server import UdfServer


@pytest.fixture
def srv():
    s = UdfServer({
        "gcd": lambda a, b: np.gcd(np.nan_to_num(a, nan=1.0).astype(np.int64),
                                   np.nan_to_num(b, nan=1.0).astype(np.int64)),
        "shout": lambda s_: np.array([str(x).upper() + "!" for x in s_],
                                     dtype=object),
        "boom": lambda a: (_ for _ in ()).throw(ValueError("nope")),
    })
    yield s
    s.shutdown()


@pytest.fixture
def ctx(tmp_path):
    c = SessionContext(str(tmp_path))
    yield c
    c.close()


def test_external_udf_scalar(ctx, srv):
    ctx.sql(f"CREATE FUNCTION gcd (INT, INT) RETURNS BIGINT "
            f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    assert ctx.sql("SELECT gcd(12, 18)").rows() == [(6,)]
    # over a table column (NULL inputs reach the server; this handler
    # maps them to 1 -> gcd(1, 5) = 1)
    ctx.sql("CREATE TABLE ut (a INT, b INT)")
    ctx.sql("INSERT INTO ut VALUES (12, 18), (7, 21), (NULL, 5)")
    rows = ctx.sql("SELECT gcd(a, b) FROM ut ORDER BY b").rows()
    assert rows == [(1,), (6,), (7,)]


def test_external_udf_strings(ctx, srv):
    ctx.sql(f"CREATE FUNCTION shout (VARCHAR) RETURNS VARCHAR "
            f"LANGUAGE python HANDLER='shout' ADDRESS='{srv.address}'")
    ctx.sql("CREATE TABLE st2 (s VARCHAR)")
    ctx.sql("INSERT INTO st2 VALUES ('hi'), ('yo')")
    assert ctx.sql("SELECT shout(s) FROM st2 ORDER BY s").rows() == \
        [("HI!",), ("YO!",)]


def test_external_udf_errors(ctx, srv):
    ctx.sql(f"CREATE FUNCTION boom (INT) RETURNS INT "
            f"LANGUAGE python HANDLER='boom' ADDRESS='{srv.address}'")
    with pytest.raises(UDFServerError):
        ctx.sql("SELECT boom(1)")
    # wrong arity is a bind-time error
    ctx.sql(f"CREATE FUNCTION gcd (INT, INT) RETURNS BIGINT "
            f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    with pytest.raises(SemanticError):
        ctx.sql("SELECT gcd(1)")


def test_external_udf_lifecycle(ctx, srv):
    ctx.sql(f"CREATE FUNCTION gcd (INT, INT) RETURNS BIGINT "
            f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    assert ctx.sql("SELECT gcd(10, 4)").rows() == [(2,)]
    ctx.sql("DROP FUNCTION gcd")
    with pytest.raises(Exception):
        ctx.sql("SELECT gcd(10, 4)")
    # CREATE OR REPLACE swaps the definition
    ctx.sql(f"CREATE FUNCTION gcd (INT, INT) RETURNS BIGINT "
            f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    ctx.sql(f"CREATE OR REPLACE FUNCTION gcd (INT, INT) RETURNS BIGINT "
            f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    assert ctx.sql("SELECT gcd(9, 6)").rows() == [(3,)]


def test_external_udf_persists_across_sessions(tmp_path, srv):
    c1 = SessionContext(str(tmp_path))
    c1.sql(f"CREATE FUNCTION gcd (INT, INT) RETURNS BIGINT "
           f"LANGUAGE python HANDLER='gcd' ADDRESS='{srv.address}'")
    c1.close()
    c2 = SessionContext(str(tmp_path))
    assert c2.sql("SELECT gcd(8, 12)").rows() == [(4,)]
    c2.close()
