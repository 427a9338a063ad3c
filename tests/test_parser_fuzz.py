"""Parser fuzzing (VERDICT r2 item 8; reference: tests/fuzz +
ci-run-fuzz-tests.sh).

A 2,300-line hand-written parser is a crash surface: any uncaught
exception other than SyntaxException on arbitrary input is a bug. Three
generators, >=12k cases total:

1. random byte/char soup,
2. token-stream mutation of a seed corpus (drop/dup/swap/replace),
3. grammar-ish recombination of corpus fragments.
"""

import random
import string

import pytest

from databend_tpu.errors import SyntaxException
from databend_tpu.sql.parser import parse_statements

SEEDS = [
    "SELECT 1",
    "SELECT a, b FROM t WHERE x > 3 AND y LIKE '%z%' ORDER BY a LIMIT 5",
    "SELECT count(*), sum(v) FROM t GROUP BY k HAVING count(*) > 2",
    "SELECT * FROM a JOIN b ON a.k = b.k LEFT JOIN c USING (k)",
    "CREATE TABLE t (a INT NOT NULL, b VARCHAR, c VECTOR(8), d MAP(STRING, INT))",
    "INSERT INTO t VALUES (1, 'x', [1,2], {'k': 1}), (2, NULL, [], {})",
    "WITH s AS (SELECT 1 AS x) SELECT * FROM s",
    "SELECT CASE WHEN a = 1 THEN 'x' ELSE 'y' END FROM t",
    "COPY INTO t FROM @st FILE_FORMAT = (type = 'CSV')",
    "CREATE VECTOR INDEX idx ON t (emb) distance = 'cosine'",
    "SELECT id FROM t ORDER BY cosine_distance(emb, [1.0, 2.0]) ASC LIMIT 10",
    "UPDATE t SET a = a + 1 WHERE b IN (SELECT b FROM u)",
    "DELETE FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.k = t.k)",
    "SELECT a, row_number() OVER (PARTITION BY g ORDER BY ts) FROM t",
    "SELECT * FROM t PIVOT (sum(v) FOR k IN ('a', 'b'))",
    "GRANT SELECT ON db.* TO ROLE r1",
    "CREATE TASK tk WAREHOUSE = 'w' SCHEDULE = 5 MINUTE AS SELECT 1",
    "ALTER TABLE t ADD COLUMN z DOUBLE DEFAULT 0.5",
    "SELECT extract(minute FROM ts), DATE_TRUNC('day', d) FROM t",
    "EXPLAIN SELECT * FROM t WHERE a BETWEEN 1 AND 2",
    "SHOW TABLES FROM db LIKE 'x%'",
    "SELECT array_map([1,2], x -> x + 1), m['k'], t.c.1 FROM t",
    "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v"
    " WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v)",
    "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS v(x, y)",
]

TOKENS = ["SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER", "LIMIT", "(",
          ")", ",", "*", "+", "-", "=", "<>", "JOIN", "ON", "AND", "OR",
          "NOT", "NULL", "1", "'s'", "[1,2]", "t", "a", "::", ".", ";",
          "CASE", "WHEN", "THEN", "END", "IN", "EXISTS", "--x", "/*c*/",
          "0x1f", "1e9", "''", '"q"', "@st", "$1", "\\", "\x00", "🦆"]


def _check(sql: str):
    """Any exception except SyntaxException (or RecursionError from
    pathological nesting, which the API guards at saner depths) is a
    parser bug."""
    try:
        parse_statements(sql)
    except SyntaxException:
        pass
    except RecursionError:
        pytest.fail(f"parser recursion blowup on: {sql[:200]!r}")
    except Exception as e:  # pragma: no cover - only on failure
        pytest.fail(f"parser raised {type(e).__name__}: {e}\n"
                    f"input: {sql[:300]!r}")


def test_fuzz_char_soup():
    rng = random.Random(0xC0FFEE)
    alphabet = string.printable + "\x00\x01🦆漢"
    for _ in range(4000):
        n = rng.randrange(0, 60)
        _check("".join(rng.choice(alphabet) for _ in range(n)))


def test_fuzz_token_mutation():
    rng = random.Random(42)
    for _ in range(6000):
        seed = rng.choice(SEEDS)
        toks = seed.split(" ")
        op = rng.randrange(4)
        if op == 0 and len(toks) > 1:     # drop
            del toks[rng.randrange(len(toks))]
        elif op == 1:                     # duplicate
            i = rng.randrange(len(toks))
            toks.insert(i, toks[i])
        elif op == 2 and len(toks) > 1:   # swap
            i = rng.randrange(len(toks) - 1)
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
        else:                             # replace with a random token
            toks[rng.randrange(len(toks))] = rng.choice(TOKENS)
        _check(" ".join(toks))


def test_fuzz_fragment_recombination():
    rng = random.Random(7)
    frags = [s.split(" ") for s in SEEDS]
    for _ in range(3000):
        parts = []
        for _j in range(rng.randrange(1, 4)):
            f = rng.choice(frags)
            a = rng.randrange(len(f))
            b = rng.randrange(a, min(len(f), a + 8) + 1)
            parts.extend(f[a:b])
        _check(" ".join(parts))


def test_fuzz_deep_nesting_bounded():
    # nested parens/subqueries must fail cleanly, not blow the C stack
    for depth in (10, 100, 400):
        _check("SELECT " + "(" * depth + "1" + ")" * depth)
        _check("SELECT * FROM " + "(SELECT * FROM " * depth
               + "t" + ")" * depth)
