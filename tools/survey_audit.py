#!/usr/bin/env python3
"""Audit SURVEY.md section 2's operator inventory.

Asserts the machine-checkable invariants of the coverage checklist:

  1. Operator row IDs are UNIQUE across all of section 2's tables (the
     round-12/13 verdicts flagged nine duplicated IDs — E8d, S6c, E147,
     E148, E236-E239, E241 — renumbered in round 14; this script keeps
     them unique).
  2. Every query-bearing row names at least one backticked `q_*` query.

Prints the inventory summary (rows, distinct IDs, distinct query names)
and exits 1 on any violation, so it can run as a gate.

Usage: python3 tools/survey_audit.py [SURVEY.md]
"""
import re
import sys
from collections import Counter


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
    lines = open(path, encoding="utf-8").read().splitlines()

    # Section 2 spans from '## 2.' to the next '## ' heading.
    start = next(i for i, l in enumerate(lines) if l.startswith("## 2."))
    end = next(i for i in range(start + 1, len(lines))
               if lines[i].startswith("## "))
    section = lines[start:end]

    id_re = re.compile(r"^\|\s*([A-Z]+\d+[a-z]*)\s*\|")
    q_re = re.compile(r"`(q_[a-z0-9_]+)`")

    ids, row_queries = [], []
    for l in section:
        m = id_re.match(l)
        if not m:
            continue
        ids.append(m.group(1))
        # Query names live in the LAST column; take backticked q_* there.
        last_col = l.rstrip("|").rsplit("|", 1)[-1]
        row_queries.append((m.group(1), q_re.findall(last_col)))

    dupes = {i: n for i, n in Counter(ids).items() if n > 1}
    queries = sorted({q for _, qs in row_queries for q in qs})

    print(f"section 2 operator rows : {len(ids)}")
    print(f"distinct operator IDs   : {len(set(ids))}")
    print(f"distinct query names    : {len(queries)}")

    ok = True
    if dupes:
        ok = False
        print(f"FAIL: duplicated operator IDs: {sorted(dupes)}")
    if not ok:
        return 1
    print("PASS: all operator IDs unique")
    return 0


if __name__ == "__main__":
    sys.exit(main())
