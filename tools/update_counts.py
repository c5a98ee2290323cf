#!/usr/bin/env python3
"""Regenerate the query/spec count lines in README/COVERAGE/SCALING from
actual run artifacts, so the docs can never drift from reality again
(round-9 "418 vs 421" and round-10 "109 vs 162" were both hand-edited
counts going stale).

Usage:
    python3 tools/update_counts.py --vout /tmp/vout --tests 456 [--dry-run]

  --vout   a graft.Verify output dir; its oracle_sql.json keys are the
           authoritative oracled-query count
  --tests  the "Total number of tests run: N" line from a full `sbt test`
"""
import argparse
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# (file, pattern, replacement-template) — {q} = query count, {t} = test count.
# Patterns are anchored to their exact count lines; historical protocol
# records ("all 154 queries" in past-round bench notes) are NOT touched.
RULES = [
    ("SCALING.md",
     r"DuckDB oracles \(\d+ queries, `tools/oracle_check\.py`\)",
     "DuckDB oracles ({q} queries, `tools/oracle_check.py`)"),
    ("COVERAGE.md",
     r"all \d+ queries hash-match \(at all three SFs\)",
     "all {q} queries hash-match (at all three SFs)"),
    ("COVERAGE.md",
     r"ScalaTest \(\d+ tests\)",
     "ScalaTest ({t} tests)"),
    ("README.md",
     r"# \d+ ScalaTest specs",
     "# {t} ScalaTest specs"),
    ("README.md",
     r"# \d+/\d+ PASS",
     "# {q}/{q} PASS"),
    ("README.md",
     r"all \d+ driver queries",
     "all {q} driver queries"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vout", required=True)
    ap.add_argument("--tests", type=int, required=True)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    oracle = pathlib.Path(args.vout) / "oracle_sql.json"
    q = len(json.loads(oracle.read_text()))
    changed = 0
    for fname, pat, repl in RULES:
        path = REPO / fname
        text = path.read_text()
        new, n = re.subn(pat, repl.format(q=q, t=args.tests), text)
        if n == 0:
            print(f"WARN {fname}: pattern not found: {pat}", file=sys.stderr)
        elif new != text:
            changed += n
            print(f"{fname}: {n} line(s) -> q={q} t={args.tests}")
            if not args.dry_run:
                path.write_text(new)
    print(f"{changed} line(s) updated (queries={q}, tests={args.tests})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
