"""sqllogictest runner.

Reference analog: tests/sqllogictests/src/main.rs (custom Rust runner over
the standard sqllogictest format; suites under tests/sqllogictests/suites).
This runner consumes the same record format so behavioral specs can be
written once and replayed against the engine:

    statement ok
    CREATE TABLE t (a INT)

    statement error <regex>
    SELECT bad syntax

    query I            # column types: I=int, F=float, T=text, B=bool
    SELECT a FROM t ORDER BY a
    ----
    1
    2

``query`` result blocks compare whitespace-normalized cell text; a
``----`` terminated by a blank line. Directives supported: statement
ok/error, query <types> [sort], onlyif/skipif (ignored), halt, include.
"""

from __future__ import annotations

import math
import os
import re
from typing import List, Optional, Tuple

from ..errors import DatabendError, _err

SqlLogicError = _err("SqlLogicError", 1210)


def _fmt_cell(v) -> str:
    import datetime as _dt
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, _dt.datetime):
        # reference always renders 6-digit microseconds
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return f"{v:.4f}".rstrip("0").rstrip(".") if "." in f"{v:.4f}" else f"{v:.4f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_fmt_cell(x) for x in v) + "]"
    return str(v)


class _Record:
    def __init__(self, kind, arg, sql, expected, line):
        self.kind = kind          # statement | query | halt
        self.arg = arg            # "ok" | error-regex | type-string
        self.sql = sql
        self.expected = expected  # list of expected lines (query only)
        self.line = line


def _parse_records(text: str, path: str = "<text>") -> List[_Record]:
    lines = text.split("\n")
    records: List[_Record] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        start_line = i + 1
        if line.startswith(("onlyif", "skipif")):
            i += 1
            continue
        if line == "halt":
            records.append(_Record("halt", None, None, None, start_line))
            i += 1
            continue
        if line.startswith("include"):
            records.append(_Record("include", line.split(None, 1)[1], None,
                                   None, start_line))
            i += 1
            continue
        if line.startswith("statement"):
            arg = line[len("statement"):].strip()
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and not lines[i].startswith("----"):
                sql_lines.append(lines[i])
                i += 1
            records.append(_Record("statement", arg, "\n".join(sql_lines),
                                   None, start_line))
            continue
        if line.startswith("query"):
            arg = line[len("query"):].strip()
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----" and lines[i].strip():
                sql_lines.append(lines[i])
                i += 1
            expected = None
            if i < n and lines[i].strip() == "----":
                i += 1
                expected = []
                while i < n and lines[i].strip() != "":
                    expected.append(lines[i].rstrip())
                    i += 1
            records.append(_Record("query", arg, "\n".join(sql_lines),
                                   expected, start_line))
            continue
        raise SqlLogicError(f"{path}:{start_line}: unknown directive {line!r}")
    return records


def _rows_match_numeric(exp: List[str], got: List[str]) -> bool:
    """Cell-wise fallback compare: float cells match within tolerance
    (f32 engines legitimately differ in the last digits; the standard
    sqllogictest runners do typed float comparison too)."""
    if len(exp) != len(got):
        return False
    for e_row, g_row in zip(exp, got):
        ec, gc = e_row.split(" "), g_row.split(" ")
        if len(ec) != len(gc):
            return False
        for e, g in zip(ec, gc):
            if e == g:
                continue
            try:
                ef, gf = float(e), float(g)
            except ValueError:
                return False
            if math.isnan(ef) and math.isnan(gf):
                continue
            if not math.isclose(ef, gf, rel_tol=1e-3, abs_tol=1e-4):
                return False
    return True


def run_text(session, text: str, path: str = "<text>") -> int:
    """Run sqllogictest records against a SessionContext; returns the
    number of records executed. Raises SqlLogicError on first mismatch."""
    executed = 0
    for rec in _parse_records(text, path):
        if rec.kind == "halt":
            break
        if rec.kind == "include":
            base = os.path.dirname(path) if path != "<text>" else "."
            executed += run_file(session, os.path.join(base, rec.arg))
            continue
        executed += 1
        if rec.kind == "statement":
            if rec.arg.startswith("error"):
                pattern = rec.arg[len("error"):].strip()
                try:
                    session.sql(rec.sql)
                except DatabendError as e:
                    if pattern and not re.search(pattern, str(e)):
                        raise SqlLogicError(
                            f"{path}:{rec.line}: error mismatch: "
                            f"expected /{pattern}/, got {e}")
                else:
                    raise SqlLogicError(
                        f"{path}:{rec.line}: expected an error, statement succeeded")
            else:
                try:
                    session.sql(rec.sql)
                except DatabendError as e:
                    raise SqlLogicError(f"{path}:{rec.line}: statement failed: {e}")
        elif rec.kind == "query":
            sort_mode = "rowsort" in rec.arg or "sort" in rec.arg.split()
            try:
                res = session.sql(rec.sql)
            except DatabendError as e:
                raise SqlLogicError(f"{path}:{rec.line}: query failed: {e}")
            got = [" ".join(_fmt_cell(v) for v in row) for row in res.rows()]
            if sort_mode:
                got = sorted(got)
            if rec.expected is None:
                continue
            exp = [e.strip() for e in rec.expected]
            if sort_mode:
                exp = sorted(exp)
            got_n = [re.sub(r"\s+", " ", g).strip() for g in got]
            exp_n = [re.sub(r"\s+", " ", e).strip() for e in exp]
            if got_n != exp_n and not _rows_match_numeric(exp_n, got_n):
                raise SqlLogicError(
                    f"{path}:{rec.line}: result mismatch\n"
                    f"  expected: {exp_n}\n  got:      {got_n}")
    return executed


def run_file(session, path: str) -> int:
    with open(path, "r", encoding="utf-8") as f:
        return run_text(session, f.read(), path)


def run_suite(session_factory, suite_dir: str) -> Tuple[int, List[str]]:
    """Run every .test file under a directory tree. Returns
    (records_executed, failures). Each file gets a fresh session."""
    executed = 0
    failures: List[str] = []
    for root, _, files in os.walk(suite_dir):
        for fn in sorted(files):
            if not fn.endswith(".test"):
                continue
            p = os.path.join(root, fn)
            try:
                executed += run_file(session_factory(), p)
            except DatabendError as e:
                failures.append(f"{p}: {e}")
    return executed, failures
