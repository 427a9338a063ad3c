"""Triage reference sqllogictest files against the engine.

For each candidate file from the reference corpus, run it with a fresh
SessionContext and report PASS, or the first failure (file:line + error
head). Used to pick which files to port into tests/suites/ported/ and
which dialect gaps to fix first (VERDICT r4 item 5).

Usage: python scripts/triage_corpus.py <file-or-dir> [...]
"""
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databend_tpu.service.session import SessionContext  # noqa: E402
from databend_tpu.testing.sqllogic import run_file  # noqa: E402


def triage(path):
    with tempfile.TemporaryDirectory() as d:
        try:
            n = run_file(SessionContext(os.path.join(d, "db")), path)
            return ("PASS", n, "")
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:300]
            return ("FAIL", 0, msg)


def main():
    targets = []
    for arg in sys.argv[1:]:
        if os.path.isdir(arg):
            for root, _, files in os.walk(arg):
                for fn in sorted(files):
                    if fn.endswith(".test"):
                        targets.append(os.path.join(root, fn))
        else:
            targets.append(arg)
    n_pass = 0
    for t in targets:
        status, n, msg = triage(t)
        if status == "PASS":
            n_pass += 1
            print(f"PASS {n:5d}  {t}")
        else:
            print(f"FAIL        {t}\n            {msg}")
        sys.stdout.flush()
    print(f"\n{n_pass}/{len(targets)} files pass")


if __name__ == "__main__":
    main()
