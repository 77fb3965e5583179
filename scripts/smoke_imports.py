#!/usr/bin/env python
"""Seconds-fast commit smoke: no registry callable may be broken at
the name-resolution level (VERDICT r7 item 2).

The r7 snapshot commit shipped a NameError — streaming/vectors.py
called ``staged_ready`` without importing it — that a plain module
import would NOT catch (the name resolves lazily, at call time). So
this smoke does three things, all without starting Spark:

1. imports every module under ``etl_gcp_spark`` plus
   ``__spark_entry__`` (catches syntax errors and import-time
   failures);
2. statically resolves every GLOBAL-scope name used inside every
   function/lambda/comprehension of every package module via
   :mod:`symtable`: a name that some inner scope reads from module
   scope but that is neither defined at module level, a builtin,
   nor an explicit module ``__dunder__`` is exactly the class of bug
   that shipped — flagged here at commit time instead of raising in
   the Nth streaming microbatch;
3. constructs the registry contract — ``queries()`` and
   ``oracle_sql()`` — and checks every oracle key has a query and
   every query value is callable.

Exit 1 on any finding. Wired as stage 0 of scripts/round_gate.sh.
"""
from __future__ import annotations

import builtins
import importlib
import os
import pkgutil
import symtable
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# names legitimately resolved at runtime without a static module-level
# definition (none currently; add sparingly, with a reason)
ALLOW: dict[str, set[str]] = {}


def _module_files() -> list[str]:
    files = [os.path.join(REPO, "__spark_entry__.py")]
    for root, _dirs, names in os.walk(os.path.join(REPO, "etl_gcp_spark")):
        if "__pycache__" in root:
            continue
        files.extend(
            os.path.join(root, n) for n in names if n.endswith(".py")
        )
    return sorted(files)


def _undefined_globals(path: str) -> list[str]:
    src = open(path).read()
    top = symtable.symtable(src, path, "exec")
    module_names = {s.get_name() for s in top.get_symbols()}
    known = module_names | set(dir(builtins)) | {
        "__file__", "__name__", "__doc__", "__package__", "__spec__",
        "__loader__", "__builtins__", "__class__",
    } | ALLOW.get(os.path.relpath(path, REPO), set())

    bad: list[str] = []

    def walk(tbl: symtable.SymbolTable) -> None:
        if tbl is not top:
            for sym in tbl.get_symbols():
                # a referenced name resolved to GLOBAL scope must
                # exist at module level (assignments are fine — they
                # only occur under `global` declarations)
                if (
                    sym.is_global()
                    and sym.is_referenced()
                    and sym.get_name() not in known
                ):
                    bad.append(f"{tbl.get_name()}: {sym.get_name()}")
        for child in tbl.get_children():
            walk(child)

    walk(top)
    return bad


def main() -> int:
    failures: list[str] = []

    # 1. import every package module + the entry contract
    import etl_gcp_spark  # noqa: F401

    for mod in pkgutil.walk_packages(
        etl_gcp_spark.__path__, prefix="etl_gcp_spark."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001 — report, don't mask
            failures.append(f"import {mod.name}: {exc!r}")
    try:
        entry = importlib.import_module("__spark_entry__")
    except Exception as exc:  # noqa: BLE001
        failures.append(f"import __spark_entry__: {exc!r}")
        entry = None

    # 2. static undefined-global scan
    for path in _module_files():
        for hit in _undefined_globals(path):
            failures.append(
                f"undefined global in {os.path.relpath(path, REPO)} "
                f"({hit})"
            )

    # 3. registry contract construction
    if entry is not None:
        qs = entry.queries()
        sql = entry.oracle_sql()
        for name, fn in qs.items():
            if not callable(fn):
                failures.append(f"queries()['{name}'] is not callable")
        for name in sql:
            if name not in qs:
                failures.append(f"oracle_sql()['{name}'] has no query")
        print(
            f"smoke: {len(qs)} registry entries, {len(sql)} oracles, "
            f"{len(_module_files())} modules scanned"
        )

    for f in failures:
        print(f"SMOKE FAIL: {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
