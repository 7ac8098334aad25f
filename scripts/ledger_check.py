#!/usr/bin/env python
"""Mechanize the mid-round re-proof rule (VERDICT r6 item 7).

Usage: python scripts/ledger_check.py <ledger-rev> [head-rev]

The rotation ledger (COVERAGE.md) is committed BEFORE a round's code work;
any registered query whose code path changes after that commit must sit in
CORRECTNESS_WINDOW for the round (or be explicitly flagged in the ledger).
Round 6 missed this once (the collect-guard pair) because the rule was
enforced by eyeball. This script makes the check a grep, not a memory:

1. `git diff --name-only <ledger-rev>..HEAD` -> changed .py files.
2. Parse __spark_entry__.py: for each registered query (the `_registry()`
   dict literal), collect every `meds_polars_functions_spark.*` module its
   q_-function imports (ast walk over the function body).
3. A changed package module maps to every query that imports it; a change
   to __spark_entry__.py itself maps to the queries whose function source
   segment changed (line-range intersection with the unified diff hunks).
4. FAIL (exit 1) listing any affected query outside CORRECTNESS_WINDOW.

Conservative by design: module-level granularity over-approximates (a
touched module flags all its importers, even for comment-only edits) —
over-flagging costs a window slot or an explicit ledger note; under-flagging
costs a stale driver row, which is the regression class this kills.
"""

from __future__ import annotations

import ast
import re
import subprocess
import sys

REPO = "/root/repo"
PKG = "meds_polars_functions_spark"


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def query_module_imports(tree: ast.Module) -> dict[str, set[str]]:
    """q_-function name -> set of package module paths it imports."""
    out: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            mods: set[str] = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom) and sub.module and sub.module.startswith(PKG):
                    mods.add(sub.module.replace(".", "/") + ".py")
                elif isinstance(sub, ast.Import):
                    for a in sub.names:
                        if a.name.startswith(PKG):
                            mods.add(a.name.replace(".", "/") + ".py")
            out[node.name] = mods
    return out


def registry_map(src: str) -> dict[str, str]:
    """registered query name -> q_-function name (from the _registry literal)."""
    return dict(re.findall(r'^\s+"([a-z0-9_]+)": (q_[a-z0-9_]+),', src, re.M))


def changed_entry_functions(ledger_rev: str, head: str, tree: ast.Module) -> set[str]:
    """q_-functions whose source lines intersect the entry-file diff hunks."""
    diff = sh("git", "diff", "--unified=0", f"{ledger_rev}..{head}", "--", "__spark_entry__.py")
    hunks: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        n = int(m.group(2) or "1")
        hunks.append((start, start + max(n, 1) - 1))
    hit: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            lo, hi = node.lineno, node.end_lineno or node.lineno
            if any(not (b < lo or a > hi) for a, b in hunks):
                hit.add(node.name)
    return hit


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ledger_rev, head = sys.argv[1], (sys.argv[2] if len(sys.argv) > 2 else "HEAD")

    changed = set(sh("git", "diff", "--name-only", f"{ledger_rev}..{head}").split())
    changed_pkg = {f for f in changed if f.startswith(PKG + "/") and f.endswith(".py")}

    entry_src = sh("git", "show", f"{head}:__spark_entry__.py")
    tree = ast.parse(entry_src)
    imports = query_module_imports(tree)
    reg = registry_map(entry_src)

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry  # noqa: E402  (window list of HEAD worktree)

    affected: dict[str, str] = {}
    for qname, fname in reg.items():
        mods = imports.get(fname, set())
        hit = sorted(mods & changed_pkg)
        if hit:
            affected[qname] = f"imports changed module(s): {', '.join(hit)}"
    for fname in changed_entry_functions(ledger_rev, head, tree):
        for qname, f2 in reg.items():
            if f2 == fname:
                affected.setdefault(qname, "query function body changed in __spark_entry__.py")

    window = set(entry.CORRECTNESS_WINDOW)
    out_of_window = {q: why for q, why in affected.items() if q not in window}

    print(f"changed package modules since {ledger_rev}: {len(changed_pkg)}")
    for f in sorted(changed_pkg):
        print(f"  {f}")
    print(f"affected registered queries: {len(affected)} "
          f"({sum(1 for q in affected if q in window)} in window)")
    for q in sorted(affected):
        mark = "OK  (in window)" if q in window else "MISS (NOT in window)"
        print(f"  {mark}: {q} — {affected[q]}")
    if out_of_window:
        print("\nFAIL: the queries above marked MISS changed after the ledger "
              "but are not in CORRECTNESS_WINDOW. Swap them in or flag them "
              "explicitly in COVERAGE.md's ledger section.")
        return 1
    print("\nledger check PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
