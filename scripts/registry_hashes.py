#!/usr/bin/env python
"""Dump a stable hash of each registry entry's query-fn source and oracle SQL.

Used by coverage_report.py --hashes to flag entries whose query fn or
oracle text changed AFTER their driver-green round (VERDICT r5 item 2):
a driver-green stamp only proves the code as it was in that round's
window, so any later edit demotes the entry back to "needs re-window".

Run against an arbitrary commit via a detached worktree:

    git worktree add /tmp/rN <commit>
    (cd /tmp/rN && python scripts/registry_hashes.py > /tmp/rN.json)

Pure-Python: imports __spark_entry__ but never builds a SparkSession
(queries() only constructs closures; oracle_sql() is a dict of strings).
"""
from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys


def _h(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]


def _src(obj) -> str:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return repr(obj)


def _code_idents(source: str) -> set[str]:
    """Identifiers appearing in CODE (comments and string literals
    stripped via tokenize) — a comment like '10 queries' must not pull
    the queries() registry assembly into an entry's helper closure."""
    import io
    import tokenize

    idents: set[str] = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(source).readline):
            if tok.type == tokenize.NAME:
                idents.add(tok.string)
    except Exception:
        import re

        idents = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", source))
    return idents


def _closure_src(raw, module) -> str:
    """Source of `raw` plus every module-level function of `module` it
    references, to a fixpoint — so an edit to a shared helper (e.g. the
    oracle side-write plumbing) changes the hash of every entry that
    calls it, not just entries whose own body was edited. The registry
    assembly surface (queries/oracle_sql/entry) is excluded: it is not
    a runtime helper, and its text churns on every window rotation."""
    import types

    mod_fns = {
        n: o for n, o in vars(module).items()
        if isinstance(o, types.FunctionType)
        and o.__module__ == module.__name__
        and n not in ("queries", "oracle_sql", "entry")
    }
    seen, queue, parts = set(), [raw], []
    while queue:
        fn = queue.pop()
        if fn in seen:
            continue
        seen.add(fn)
        s = _src(fn)
        parts.append(s)
        for name in _code_idents(s):
            helper = mod_fns.get(name)
            if helper is not None and helper not in seen:
                queue.append(helper)
    return "\n".join(sorted(parts))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as e

    out = {}
    sql = e.oracle_sql()
    for name, fn in e.queries().items():
        raw = getattr(fn, "__wrapped__", fn)
        out[name] = {
            "fn": _h(_closure_src(raw, e)),
            "oracle": _h(sql.get(name, "")),
        }
    json.dump(out, sys.stdout, indent=0, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
