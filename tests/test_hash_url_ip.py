"""Hash / URL / IP scalar functions (reference scalars/hash.rs + URL/IP
families)."""

import pytest

from databend_tpu import SessionContext


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def q1(ctx, sql):
    rows = ctx.sql(sql).rows()
    assert len(rows) == 1
    return rows[0]


def test_hashes(ctx):
    assert q1(ctx, "SELECT md5('abc')") \
        == ("900150983cd24fb0d6963f7d28e17f72",)
    assert q1(ctx, "SELECT sha('abc')") \
        == ("a9993e364706816aba3e25717850c26c9cd0d89d",)
    assert q1(ctx, "SELECT sha2('abc', 256)")[0].startswith("ba7816bf")
    # xxhash64 spec vector (seed 0, empty input)
    from databend_tpu.expression.functions.hash_url_fns import _xxhash64
    assert _xxhash64("") == 0xEF46DB3751D8E999
    # deterministic + spread across all code paths (tail/4B/8B/32B blocks)
    a = q1(ctx, "SELECT xxhash64('hello world')")[0]
    b = q1(ctx, "SELECT xxhash64('hello world')")[0]
    assert a == b != 0
    vals = {q1(ctx, f"SELECT xxhash64('{'x' * n}')")[0]
            for n in (0, 1, 3, 5, 9, 17, 33, 65)}
    assert len(vals) == 8


def test_url_functions(ctx):
    url = "https://www.example.com:8080/a/b?x=1&y=2#frag"
    assert q1(ctx, f"SELECT protocol('{url}'), domain('{url}'),"
                   f" port('{url}'), path('{url}')") \
        == ("https", "www.example.com", 8080, "/a/b")
    assert q1(ctx, f"SELECT query_string('{url}'), fragment('{url}')") \
        == ("x=1&y=2", "frag")
    assert q1(ctx, f"SELECT domain_without_www('{url}'),"
                   f" top_level_domain('{url}')") == ("example.com", "com")
    assert q1(ctx, f"SELECT extract_url_parameter('{url}', 'y')") == ("2",)
    assert q1(ctx, "SELECT url_encode('a b/c'), url_decode('a%20b%2Fc')") \
        == ("a%20b%2Fc", "a b/c")
    # bare hostnames work too
    assert q1(ctx, "SELECT domain('example.org/x')") == ("example.org",)


def test_ip_functions(ctx):
    assert q1(ctx, "SELECT ipv4_string_to_num('1.2.3.4')") == (16909060,)
    assert q1(ctx, "SELECT inet_ntoa(16909060)") == ("1.2.3.4",)
    assert q1(ctx, "SELECT try_ipv4_string_to_num('nope')") == (None,)
    assert q1(ctx, "SELECT try_inet_aton('10.0.0.1')") == (167772161,)
    assert q1(ctx, "SELECT ip_in_cidr('10.1.2.3', '10.0.0.0/8'),"
                   " ip_in_cidr('11.0.0.1', '10.0.0.0/8')") == (True, False)
    with pytest.raises(Exception):
        ctx.sql("SELECT ipv4_string_to_num('not-an-ip')")
