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


def _local_imports(source: str) -> list[tuple[str, list[str]]]:
    """(module, [names]) for every `from etl_gcp_spark... import ...`
    statement anywhere in `source` — the _q_* wrappers import their
    operator inside the function body, so __globals__ never sees it."""
    import ast
    import textwrap

    out: list[tuple[str, list[str]]] = []
    try:
        tree = ast.parse(textwrap.dedent(source))
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.ImportFrom)
            and node.module
            and node.module.split(".")[0] == "etl_gcp_spark"
        ):
            out.append((node.module, [a.name for a in node.names]))
    return out


def _strip_comments(source: str) -> str:
    """Drop COMMENT tokens (and trailing-whitespace churn) from the
    hashed text: a comment cannot change behavior, so a comment-only
    edit (e.g. the round-7 `bounded:` cardinality annotations) must
    not demote a driver-green stamp. Docstrings/strings are KEPT —
    oracle SQL and kernel schemas live in string literals. Falls back
    to the raw source when tokenization fails."""
    import io
    import tokenize

    try:
        out = []
        skip = (tokenize.COMMENT, tokenize.NL)  # NL = the non-logical
        # newline emitted for blank and comment-only lines; keeping it
        # would make a pure comment INSERTION flag via its newline
        for tok in tokenize.generate_tokens(io.StringIO(source).readline):
            if tok.type not in skip:
                out.append(tok.string)
        return " ".join(out)
    except Exception:
        return source


def _eligible(obj, entry_module_name: str) -> bool:
    """Chase functions AND classes defined in the entry module or
    anywhere under etl_gcp_spark — NOT third-party/stdlib code."""
    import types

    if not (isinstance(obj, types.FunctionType) or inspect.isclass(obj)):
        return False
    mod = getattr(obj, "__module__", "") or ""
    if not (mod == entry_module_name or mod.split(".")[0] == "etl_gcp_spark"):
        return False
    return getattr(obj, "__name__", "") not in ("queries", "oracle_sql", "entry")


def _closure_src(raw, module) -> str:
    """Source of `raw` plus every function/class it references, to a
    fixpoint ACROSS etl_gcp_spark modules — so an edit to the actual
    operator body (e.g. similarity.py, text.py) changes the hash of
    every entry whose wrapper imports it, not just entries whose
    wrapper text was edited (ADVICE r6: the old walk stopped at
    __spark_entry__ and was blind to package-side drift). References
    are resolved three ways: (1) the function's __globals__ (module-
    level defs and top-level imports), (2) `from etl_gcp_spark...`
    imports inside the body (the _q_* wrapper pattern), (3) for
    classes, their defining module's namespace. The registry assembly
    surface (queries/oracle_sql/entry) stays excluded: not a runtime
    helper, and its text churns on every window rotation.

    Module-ATTRIBUTE access is chased too: `from etl_gcp_spark
    import metering` + `metering.phase(...)` resolves `metering` to
    a package module and pulls `phase` (and any other accessed
    attribute that is a function/class) into the closure — without
    this, semantics edits to such helpers left every caller's hash
    unchanged (review r7).

    Remaining documented blind spots: module-level CONSTANTS (regex
    strings, dicts) and non-function callables (e.g. pandas_udf
    wrapper objects) are not source-chased; edits to those still need
    a manual re-window."""
    seen_keys: set[tuple] = set()
    queue: list = []
    parts: list[str] = []

    def push(obj) -> None:
        key = (
            getattr(obj, "__module__", "?"),
            getattr(obj, "__qualname__", getattr(obj, "__name__", repr(obj))),
        )
        if key not in seen_keys:
            seen_keys.add(key)
            queue.append(obj)

    import re
    import types

    def _chase_module_attrs(mod, alias: str, source: str) -> None:
        """For a package module referenced as `alias` in `source`,
        chase every accessed `alias.attr` that is a function/class."""
        for attr in set(re.findall(rf"\b{re.escape(alias)}\.(\w+)", source)):
            obj = getattr(mod, attr, None)
            if obj is not None and _eligible(obj, module.__name__):
                push(obj)

    def _is_pkg_module(obj) -> bool:
        return (
            isinstance(obj, types.ModuleType)
            and (getattr(obj, "__name__", "") or "").split(".")[0]
            == "etl_gcp_spark"
        )

    push(raw)
    while queue:
        fn = queue.pop()
        s = _src(fn)
        parts.append(_strip_comments(s))
        idents = _code_idents(s)
        # unwrap decorated functions (functools.wraps preserves
        # __wrapped__): a @timed("build") wrapper's __globals__ is
        # the METERING module's namespace, so chasing through it
        # resolved none of the wrapped body's references — edits to
        # a helper reached only via a decorated function (e.g.
        # entity_labels_compact from run_streaming_entity_ingest)
        # left every caller's hash unchanged (review r9)
        ns = getattr(inspect.unwrap(fn), "__globals__", None)
        if ns is None and inspect.isclass(fn):
            defmod = sys.modules.get(getattr(fn, "__module__", ""), None)
            ns = vars(defmod) if defmod is not None else {}
        for name in idents:
            obj = (ns or {}).get(name)
            if obj is None:
                continue
            if _eligible(obj, module.__name__):
                push(obj)
            elif _is_pkg_module(obj):
                _chase_module_attrs(obj, name, s)
        for mod_name, names in _local_imports(s):
            try:
                import importlib

                m = importlib.import_module(mod_name)
            except Exception:
                continue
            for n in names:
                obj = getattr(m, n, None)
                if obj is None:
                    continue
                if _eligible(obj, module.__name__):
                    push(obj)
                elif _is_pkg_module(obj):
                    # `from etl_gcp_spark import metering` inside the
                    # body: chase metering.<attr> accesses
                    _chase_module_attrs(obj, n, s)
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
