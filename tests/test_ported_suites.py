"""Reference sqllogictest corpus, ported (VERDICT r3 item 6).

tests/suites/ported/ holds mechanical translations of the reference
acceptance files (09_vector_index, 04_inverted_index, base/ selection);
KNN expectation blocks are re-derived exact distances. This module runs
them AND independently cross-checks the vector expectations against a
numpy oracle so the ported numbers are not self-referential.
"""

import os
import re

import numpy as np
import pytest

from databend_tpu.service.session import SessionContext
from databend_tpu.testing.sqllogic import run_file, run_suite

PORTED = os.path.join(os.path.dirname(__file__), "suites", "ported")


def test_ported_suites_pass(tmp_path):
    executed, failures = run_suite(
        lambda: SessionContext(str(tmp_path / "d")), PORTED)
    assert not failures, failures
    assert executed >= 800


def test_vector_suite_expectations_match_numpy_oracle():
    """Every `query IR` block in the ported vector file must equal the
    exact top-k numpy computes from the INSERT data."""
    path = os.path.join(PORTED, "09_0000_vector_index_base.test")
    text = open(path).read()
    # parse the 16 8-dim vectors out of the INSERT statements
    rows = re.findall(r"\((\d+), \[([^\]]+)\]\)", text)
    vecs = {}
    for rid, body in rows:
        v = [float(x) for x in body.split(",")]
        if len(v) == 8 and int(rid) not in vecs:
            vecs[int(rid)] = v
    assert len(vecs) == 16
    X = np.array([vecs[i] for i in range(1, 17)], np.float32)

    def dist(metric, q):
        if metric == "cosine":
            return 1.0 - (X @ q) / (np.linalg.norm(X, axis=1)
                                    * np.linalg.norm(q))
        if metric == "l1":
            return np.abs(X - q).sum(1)
        return np.linalg.norm(X - q, axis=1)

    blocks = re.findall(
        r"SELECT id, (\w+)_distance\(embedding, \[([^\]]+)\][^\n]*FROM (t|t1)"
        r"( WHERE similarity > 0.1)? ORDER BY similarity (ASC|DESC) LIMIT "
        r"(\d+);\n----\n((?:[\d.]+ [\d.]+\n)+)", text)
    assert len(blocks) >= 12
    for metric, qtxt, _tbl, flt, direction, k, expected in blocks:
        q = np.array([float(x) for x in qtxt.split(",")], np.float32)
        d = dist(metric, q).astype(np.float32)
        order = np.argsort(-d if direction == "DESC" else d, kind="stable")
        want = []
        for i in order:
            if flt and not d[i] > 0.1:
                continue
            want.append((int(i) + 1, float(d[i])))
            if len(want) == int(k):
                break
        got = [(int(l.split()[0]), float(l.split()[1]))
               for l in expected.strip().split("\n")]
        assert [g[0] for g in got] == [w[0] for w in want], (metric, qtxt[:30])
        for (_, gv), (_, wv) in zip(got, want):
            assert abs(gv - wv) < 1e-3


def test_ported_suites_distributed(tmp_path):
    """Cluster-mode corpus rerun (analog of the reference CI's
    ci-run-sqllogic-tests-cluster.sh, which replays the whole corpus
    against a 3-node cluster): every ported file re-executed with
    enable_distributed_execution=1 on the 8-device virtual mesh."""
    i = [0]

    def factory():
        i[0] += 1
        c = SessionContext(str(tmp_path / f"d{i[0]}"))
        c.sql("SET enable_distributed_execution = 1")
        return c

    executed, failures = run_suite(factory, PORTED)
    assert not failures, failures
    assert executed >= 800
