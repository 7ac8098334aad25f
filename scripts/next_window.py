#!/usr/bin/env python
"""Compute the next round's rotation-window freshness queue.

Usage: python scripts/next_window.py [N]

Scans CORRECTNESS_r*.json for every registered query's LAST green driver
row (rows_match + schema_match + hash_match-or-absent) and prints the
registry oldest-first: last-green round, then position in that round's
record (the established ledger tiebreak). The round-N+1 ledger is then:
any queries the new round will TOUCH first (mid-round re-proof rule),
then the head of this queue up to 50 slots.

Queries with NO green row ever (should not happen since round 6) are
listed first as debt. N limits the printout (default 60).
"""

from __future__ import annotations

import glob
import json
import re
import sys

REPO = "/root/repo"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    last: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        rec = json.load(open(path))
        for i, (name, row) in enumerate(rec.items()):
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                last[name] = (rnd, i)

    # Import the registry rather than regexing the source: the staged
    # dict uses the same '"name": q_*' literal shape and a regex counts
    # its entries as registered (observed at round-11 open: 172 before
    # the registration landed).
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registered = list(entry._registry())

    debt = [q for q in registered if q not in last]
    if debt:
        print(f"NEVER-GREEN DEBT ({len(debt)}): {', '.join(debt)}")
    queue = sorted((q for q in registered if q in last), key=lambda q: last[q])
    print(f"registered: {len(registered)}; with a green row: {len(queue)}")
    print(f"freshness queue (oldest first, showing {min(n, len(queue))}):")
    for q in queue[:n]:
        rnd, idx = last[q]
        print(f"  r{rnd:02d}[{idx:3d}] {q}")
    return 1 if debt else 0


if __name__ == "__main__":
    sys.exit(main())
