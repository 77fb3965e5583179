"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash (values normalized:
floats rounded to 9 dp, timestamps to ISO strings). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from etl_gcp_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def driver_unsortable(rows):
    """Reproduce the driver's canonicalization intolerance.

    The round driver canonicalizes each result with a pandas
    ``sort_values`` over ALL columns; a list/map-typed cell raises
    ``TypeError: unhashable type`` there and the entry FAILS (this
    masked class cost 2 driver reds in round 4 — check_oracle used to
    stringify lists instead). Return the offending column type name,
    or None if every cell is scalar-sortable.
    """
    try:
        from pyspark.sql import Row as _Row
    except Exception:  # pragma: no cover - pyspark always present here
        _Row = ()
    for r in rows:
        for v in r:
            # Row subclasses tuple; any non-string sequence, mapping, or
            # set is unsortable in the driver's pandas canonicalization
            if isinstance(v, (list, dict, set, _Row)):
                return type(v).__name__
            if isinstance(v, tuple):
                return type(v).__name__
    return None


def frame_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    # Pin the PROCESS timezone, not just the Spark session: every query
    # already forces spark.sql.session.timeZone=UTC, but PySpark's
    # TimestampType.fromInternal converts collected values with
    # datetime.fromtimestamp — the PYTHON-process zone — so under e.g.
    # TZ=America/New_York every collected timestamp shifts -5h while
    # DuckDB returns the stored (UTC) wall time unchanged. That is a
    # harness artifact, not engine semantics; normalize it away here.
    import time as _time

    os.environ["TZ"] = "UTC"
    if hasattr(_time, "tzset"):
        _time.tzset()

    # the side-write skip flag is a BENCH-ONLY optimization (bench.py
    # sets it because the bench never replays oracle_sql). If it leaks
    # in from a shell that exported it, every side-table oracle here
    # would read a missing/stale parquet and fail with a confusing
    # error — the correctness path must never inherit it (ADVICE r5).
    os.environ.pop("SPARK_GRAFT_SKIP_ORACLE_SIDE_WRITE", None)

    args = [a for a in sys.argv[1:] if not a.startswith("--json=")]
    json_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc(limit=5)
            results[name] = {"status": "fail", "detail": "spark raised"}
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            bad = driver_unsortable(srows)
            if bad:
                print(
                    f"FAIL  {name}: {bad}-typed output cell "
                    "(rows-only, but driver canonicalization would raise)"
                )
                results[name] = {"status": "fail", "detail": f"{bad} cell"}
                n_fail += 1
                continue
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            results[name] = {"status": "rows_only", "rows": len(srows)}
            n_rowsonly += 1
            continue
        # watchdog: a single runaway oracle must not stall the whole
        # sweep (a quadratic closure once sat single-threaded for an
        # hour at sf0.1). duckdb honors interrupt() from another
        # thread. The callback checks a still-running flag under a
        # lock before interrupting: a bare Timer(budget, interrupt)
        # could fire AFTER fetchall() returned but BEFORE cancel(),
        # leaving a pending interrupt that spuriously kills the NEXT
        # entry's oracle on the shared connection (ADVICE r5). The
        # flag, not exception-string matching, is also how a timeout
        # is detected.
        import threading

        budget = float(os.environ.get("ORACLE_TIMEOUT_SEC", "600"))
        state = {"running": True, "timed_out": False}
        state_lock = threading.Lock()

        def _watchdog():
            with state_lock:
                if not state["running"]:
                    return
                state["timed_out"] = True
                con.interrupt()

        timer = threading.Timer(budget, _watchdog)
        timer.start()
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            with state_lock:
                interrupted = state["timed_out"]
            tag = (
                f"oracle timeout (> {budget:.0f}s)"
                if interrupted
                else "oracle raised"
            )
            print(f"FAIL  {name}: {tag}")
            if not interrupted:
                traceback.print_exc(limit=3)
            results[name] = {"status": "fail", "detail": tag}
            n_fail += 1
            continue
        finally:
            with state_lock:
                state["running"] = False
                fired = state["timed_out"]
            timer.cancel()
            if fired:
                # the callback may have fired in the sliver between
                # fetchall() returning and running=False — absorb any
                # interrupt left pending on the shared connection with
                # a sacrificial query so the next entry starts clean
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
        problems = []
        bad = driver_unsortable(srows) or driver_unsortable(orows)
        if bad:
            problems.append(
                f"{bad}-typed output cell — driver sort_values would raise"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sh, oh = frame_digest(scols, srows), frame_digest(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                sset = {
                    tuple(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                oset = {
                    tuple(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                for d in list(sset - oset)[:3]:
                    print(f"        spark-only: {d}")
                for d in list(oset - sset)[:3]:
                    print(f"        duck-only:  {d}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            results[name] = {"status": "fail", "detail": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            results[name] = {"status": "ok", "rows": len(srows)}
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
