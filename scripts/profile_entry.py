"""Profile one registry entry: per-Spark-job wall breakdown.

Usage:  python scripts/profile_entry.py <entry> [<entry> ...]

Runs each named ``__spark_entry__.queries()`` entry once (plus an
unmeasured session warm-up) with the Spark event log enabled, then
parses the log into a per-job table: job id, duration, callsite /
description, task count. This is the guide-§1 "measure first" tool —
the SQL-tab view of where an entry's wall time goes, without a UI.

The event log is written under /tmp and deleted afterwards; nothing
here touches bench methodology or BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entries = sys.argv[1:]
    if not entries:
        raise SystemExit("usage: profile_entry.py <entry> [...]")
    os.environ.setdefault("SPARK_GRAFT_SKIP_ORACLE_SIDE_WRITE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = f"/tmp/etl_gcp_spark_eventlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from etl_gcp_spark.session import get_spark

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()

    marks: list[tuple[str, float, float]] = []
    for name in entries:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        marks.append((name, t0, t1))
        print(f"# {name}: {t1 - t0:.3f}s", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling layout: eventlog_v2_<appid>/events_*_<appid>[.codec]
    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        cand = [
            p
            for p in os.listdir(evdir)
            if p.startswith(app_id) or p == f"eventlog_v2_{app_id}"
        ]
        if not cand:
            raise SystemExit(f"no event log under {evdir}")
        log_path = os.path.join(evdir, cand[0])
    if os.path.isdir(log_path):
        parts = sorted(
            p for p in os.listdir(log_path) if p.startswith("events_")
        )
        if not parts:
            raise SystemExit(f"no events_* files under {log_path}")
        log_path = [os.path.join(log_path, p) for p in parts]
    else:
        log_path = [log_path]

    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, int] = {}
    stage_job: dict[int, int] = {}
    t_epoch0 = None
    def _lines():
        for p in log_path:
            with open(p) as f:
                yield from f

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerApplicationStart":
                t_epoch0 = ev["Timestamp"] / 1000.0
            elif k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "end": None,
                    "desc": props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                    "tasks": 0,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif k == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_tasks[si["Stage ID"]] = si.get("Number of Tasks", 0)

    for sid, jid in stage_job.items():
        if jid in jobs:
            jobs[jid]["tasks"] += stage_tasks.get(sid, 0)

    # perf_counter marks vs epoch: align using relative offsets from the
    # first job after each mark's start. Approximation: assume
    # perf_counter and epoch advance identically (they do); anchor via
    # the first mark and first job inside it.
    # Simpler: report jobs bucketed by wall order against entry spans
    # translated into epoch using time.time() captured... we instead
    # re-run bucketing by proportion: entry spans are consecutive, jobs
    # are ordered; assign each job to the entry whose [t0,t1) span
    # (shifted into epoch space by a single constant) contains its start.
    if jobs and marks:
        # estimate the constant offset: epoch_of(first job start) minus
        # perf_of(first entry start) — the first entry's first job
        # starts within ms of the mark.
        jstarts = sorted(j["start"] for j in jobs.values())
        # jobs before the first mark belong to warm-up; the offset is
        # chosen so that the first job AFTER warm-up aligns with mark0.
        # Warm-up emits a handful of jobs; detect them as jobs whose
        # start precedes (mark0 offset estimate). Use median alignment:
        off = None
        for js in jstarts:
            cand = js - marks[0][1]
            # offset must place every mark span inside the log range
            if all(
                any(
                    abs((j["start"] - cand) - m[1]) < (m[2] - m[1]) + 5
                    for j in jobs.values()
                )
                for m in marks
            ):
                off = cand
                break
        if off is None:
            off = jstarts[0] - marks[0][1]
        print(f"\n{'job':>4} {'sec':>8} {'tasks':>6}  entry / description")
        per_entry: dict[str, float] = {}
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["end"] is None:
                continue
            dur = j["end"] - j["start"]
            rel = j["start"] - off
            owner = ""
            for name, a, b in marks:
                if a - 0.05 <= rel < b + 0.05:
                    owner = name
                    break
            if owner:
                per_entry[owner] = per_entry.get(owner, 0.0) + dur
            desc = (j["desc"] or "")[:90]
            print(f"{jid:>4} {dur:8.3f} {j['tasks']:>6}  [{owner}] {desc}")
        print("\nper-entry sum of job durations (gaps = driver time):")
        for name, a, b in marks:
            print(
                f"  {name}: wall {b - a:.3f}s, jobs {per_entry.get(name, 0.0):.3f}s,"
                f" driver-gap {b - a - per_entry.get(name, 0.0):.3f}s"
            )
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
