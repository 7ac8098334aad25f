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
   dict literal), collect the NAMES its q_-function imports from each
   `meds_polars_functions_spark.*` module (ast walk over the function body).
3. For each changed package module, compute the DIRTY top-level names:
   a name is dirty if its definition span intersects a diff hunk, or —
   fixpoint — if its body references a dirty module-level name (so a
   rewritten private helper like `_t_times_n` dirties every operator
   that calls it, while a freshly-ADDED function dirties nothing that
   existed before). Whole-module imports (`import pkg.mod`) and changed
   top-level code outside any definition fall back to all-names-dirty.
4. A query is affected iff it imports a dirty name; a change to
   __spark_entry__.py itself maps to the queries whose function source
   segment changed (line-range intersection with the diff hunks).
5. FAIL (exit 1) listing any affected query outside CORRECTNESS_WINDOW.
   Both the window and the registry map are parsed (ast) from the HEAD-REV
   entry source, never imported from the live worktree — so an explicit
   old head-rev validates the historical diff against that rev's own
   window, and the rev-pinned regression test survives window rotation.

Granularity is function-level but still conservative: comment-only edits
inside a function dirty it (over-flagging costs a window slot or an
explicit ledger note; under-flagging costs a stale driver row, which is
the regression class this kills).

Known limitation: the reference closure is INTRA-module. A changed
function in module Y dirties Y's own callers, but not a function in
module X that calls into Y — the check sees only what the entry file
imports. Cross-module operator calls are rare in this package (queries
import the functions they exercise directly); when making one, flag the
affected queries in the ledger by hand.
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


#: Sentinel meaning "imports the module wholesale" — any dirty name hits.
ALL = "*"


def query_module_imports(tree: ast.Module) -> dict[str, dict[str, set[str]]]:
    """q_-function name -> {module path -> imported names (or {ALL})}."""
    out: dict[str, dict[str, set[str]]] = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            mods: dict[str, set[str]] = {}
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom) and sub.module and sub.module.startswith(PKG):
                    key = sub.module.replace(".", "/") + ".py"
                    mods.setdefault(key, set()).update(
                        a.name for a in sub.names
                    )
                elif isinstance(sub, ast.Import):
                    for a in sub.names:
                        if a.name.startswith(PKG):
                            key = a.name.replace(".", "/") + ".py"
                            mods.setdefault(key, set()).add(ALL)
            out[node.name] = mods
    return out


def diff_hunks(ledger_rev: str, head: str, path: str) -> list[tuple[int, int]]:
    """New-side line ranges touched since the ledger rev (unified=0)."""
    diff = sh("git", "diff", "--unified=0", f"{ledger_rev}..{head}", "--", path)
    hunks: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        n = int(m.group(2) or "1")
        # pure deletions (n == 0) still perturb the surrounding def:
        # keep a 1-line anchor at the deletion point
        hunks.append((start, start + max(n, 1) - 1))
    return hunks


def dirty_names(module_path: str, head: str, ledger_rev: str) -> set[str]:
    """Top-level names of ``module_path`` whose behavior may have changed
    since the ledger rev: definition span intersects a diff hunk, or —
    transitively — the definition references a dirty module-level name.
    Returns {ALL} when top-level code outside any definition changed
    (conservative fallback) or the module cannot be parsed."""
    hunks = diff_hunks(ledger_rev, head, module_path)
    if not hunks:
        return set()
    try:
        src = sh("git", "show", f"{head}:{module_path}")
        tree = ast.parse(src)
    except Exception:
        return {ALL}
    src_lines = src.splitlines()

    spans: dict[str, tuple[int, int]] = {}
    refs: dict[str, set[str]] = {}
    covered: list[tuple[int, int]] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            names = [t.id for t in targets if isinstance(t, ast.Name)]
        else:
            continue
        lo = min(node.lineno, *(d.lineno for d in getattr(node, "decorator_list", []) or [node]))
        hi = node.end_lineno or node.lineno
        covered.append((lo, hi))
        body_refs = {
            s.id for s in ast.walk(node) if isinstance(s, ast.Name)
        }
        for nm in names:
            spans[nm] = (lo, hi)
            refs[nm] = body_refs
    # changed lines not covered by any definition => ALL, except inert
    # lines: imports, module docstrings / bare string constants, comments
    # and blanks (comments are invisible to the AST, so without this the
    # `#:`-style doc comments above new constants would dirty the world).
    inert_lines: set[int] = set()
    for node in tree.body:
        is_docstring = isinstance(node, ast.Expr) and isinstance(
            node.value, ast.Constant
        ) and isinstance(node.value.value, str)
        if isinstance(node, (ast.Import, ast.ImportFrom)) or is_docstring:
            inert_lines.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
    for a, b in hunks:
        for line in range(a, b + 1):
            if line in inert_lines:
                continue
            stripped = src_lines[line - 1].strip() if line <= len(src_lines) else ""
            if not stripped or stripped.startswith("#"):
                continue
            if not any(lo <= line <= hi for lo, hi in covered):
                return {ALL}

    dirty = {
        nm for nm, (lo, hi) in spans.items()
        if any(not (b < lo or a > hi) for a, b in hunks)
    }
    while True:  # fixpoint: callers of dirty names are dirty
        grew = {
            nm for nm in spans
            if nm not in dirty and refs[nm] & dirty
        }
        if not grew:
            return dirty
        dirty |= grew


def registry_map(tree: ast.Module) -> dict[str, str]:
    """registered query name -> q_-function name, from the ``_registry``
    dict literal via ast (NOT a line regex: a reformat — wrapped entry,
    missing trailing comma — must fail loudly, never silently drop queries
    from the impact map; ADVICE r8 item 3). Every key must be a string
    constant and every value a bare ``q_*`` name, or this raises."""
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "_registry":
            returns = [s for s in ast.walk(node) if isinstance(s, ast.Return)]
            if len(returns) != 1 or not isinstance(returns[0].value, ast.Dict):
                raise SystemExit("ledger_check: _registry() is not a single dict-literal return")
            out: dict[str, str] = {}
            for k, v in zip(returns[0].value.keys, returns[0].value.values):
                if k is None:  # ast gives **spread entries a None key
                    raise SystemExit(
                        "ledger_check: dict-unpacking entry in _registry "
                        f"(line {v.lineno}) — registry must stay a plain literal"
                    )
                if not (isinstance(k, ast.Constant) and isinstance(k.value, str)):
                    raise SystemExit(f"ledger_check: non-constant registry key at line {k.lineno}")
                if not (isinstance(v, ast.Name) and v.id.startswith("q_")):
                    raise SystemExit(f"ledger_check: registry value for {k.value!r} is not a q_* name")
                out[k.value] = v.id
            if len(out) != len(returns[0].value.keys):
                raise SystemExit("ledger_check: duplicate keys in _registry dict literal")
            return out
    raise SystemExit("ledger_check: no _registry() function found in entry file")


def window_list(tree: ast.Module) -> list[str]:
    """CORRECTNESS_WINDOW parsed from the HEAD-REV entry source — NOT the
    live worktree module. With an explicit old head-rev the tool must
    validate that historical diff against that rev's own window, or the
    rev-pinned regression test flips whenever the window rotates
    (ADVICE r8 item 1)."""
    for node in tree.body:
        target = None
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            target = node.target.id
        elif isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
            target = node.targets[0].id
        if target == "CORRECTNESS_WINDOW":
            value = ast.literal_eval(node.value)
            if not (isinstance(value, list) and all(isinstance(x, str) for x in value)):
                raise SystemExit("ledger_check: CORRECTNESS_WINDOW is not a list[str] literal")
            return value
    raise SystemExit("ledger_check: no CORRECTNESS_WINDOW assignment in entry file")


def changed_entry_functions(ledger_rev: str, head: str, tree: ast.Module) -> set[str]:
    """q_-functions whose source lines intersect the entry-file diff hunks."""
    hunks = diff_hunks(ledger_rev, head, "__spark_entry__.py")
    hit: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            lo, hi = node.lineno, node.end_lineno or node.lineno
            if any(not (b < lo or a > hi) for a, b in hunks):
                hit.add(node.name)
    return hit


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return 0 if len(sys.argv) >= 2 else 2
    ledger_rev, head = sys.argv[1], (sys.argv[2] if len(sys.argv) > 2 else "HEAD")

    # Validate the revs up front so a typo prints a message, not a
    # subprocess traceback (VERDICT r11 item 5).
    for rev in (ledger_rev, head):
        probe = subprocess.run(
            ["git", "rev-parse", "--verify", "--quiet", f"{rev}^{{commit}}"],
            capture_output=True, text=True,
        )
        if probe.returncode != 0:
            print(f"ledger_check: not a git revision: {rev!r}", file=sys.stderr)
            return 2

    changed = set(sh("git", "diff", "--name-only", f"{ledger_rev}..{head}").split())
    changed_pkg = {f for f in changed if f.startswith(PKG + "/") and f.endswith(".py")}

    entry_src = sh("git", "show", f"{head}:__spark_entry__.py")
    tree = ast.parse(entry_src)
    imports = query_module_imports(tree)
    reg = registry_map(tree)

    dirty_by_mod = {m: dirty_names(m, head, ledger_rev) for m in sorted(changed_pkg)}

    affected: dict[str, str] = {}
    for qname, fname in reg.items():
        mods = imports.get(fname, {})
        hits: list[str] = []
        for m, names in mods.items():
            dirty = dirty_by_mod.get(m, set())
            if not dirty:
                continue
            if ALL in dirty or ALL in names:
                hits.append(f"{m} (module-level change)")
            elif names & dirty:
                hits.append(f"{m}:{','.join(sorted(names & dirty))}")
        if hits:
            affected[qname] = f"imports dirty name(s): {'; '.join(hits)}"
    for fname in changed_entry_functions(ledger_rev, head, tree):
        for qname, f2 in reg.items():
            if f2 == fname:
                affected.setdefault(qname, "query function body changed in __spark_entry__.py")

    window = set(window_list(tree))
    out_of_window = {q: why for q, why in affected.items() if q not in window}

    print(f"changed package modules since {ledger_rev}: {len(changed_pkg)}")
    for f in sorted(changed_pkg):
        d = dirty_by_mod.get(f, set())
        label = "ALL names (module-level change)" if ALL in d else (
            f"{len(d)} dirty name(s): {', '.join(sorted(d)[:12])}" if d else "no dirty names (insertion-only)"
        )
        print(f"  {f} — {label}")
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
