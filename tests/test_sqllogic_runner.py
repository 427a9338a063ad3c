"""sqllogictest runner + in-repo suites."""

import os

import pytest

from databend_tpu.errors import DatabendError
from databend_tpu.testing import run_text, run_file, SqlLogicError
from databend_tpu.testing.sqllogic import run_suite

SUITES = os.path.join(os.path.dirname(__file__), "suites")


def test_runner_detects_mismatch(tmp_catalog):
    with pytest.raises(SqlLogicError):
        run_text(tmp_catalog, """
query I
SELECT 1 + 1
----
3
""")
    with pytest.raises(SqlLogicError):
        run_text(tmp_catalog, """
statement error nomatch_pattern
SELECT * FROM missing_table
""")


def test_runner_statement_error_matches(tmp_catalog):
    n = run_text(tmp_catalog, """
statement error [Uu]nknown
SELECT * FROM missing_table

query I
SELECT 2 * 21
----
42
""")
    assert n == 2


def test_suite_base(tmp_catalog):
    n = run_file(tmp_catalog, os.path.join(SUITES, "base", "01_basic.test"))
    assert n > 5


def test_suite_vector_index(tmp_catalog):
    run_file(tmp_catalog, os.path.join(SUITES, "index", "vector_index.test"))


def test_suite_inverted_index(tmp_catalog):
    run_file(tmp_catalog, os.path.join(SUITES, "index", "inverted_index.test"))


def test_run_suite_walks_tree(tmp_path):
    from databend_tpu.service.session import SessionContext
    count = [0]

    def factory():
        count[0] += 1
        return SessionContext(data_root=str(tmp_path / f"s{count[0]}"))

    executed, failures = run_suite(factory, SUITES)
    assert failures == []
    assert executed > 20
