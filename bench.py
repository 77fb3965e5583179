"""Benchmark harness: the FULL query registry at sf0.1, one JSON line.

Runs every ``__spark_entry__.queries()`` entry against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is forced to full execution
with a noop-format write (no driver collect, no sink I/O measured).
Benching the whole registry keeps per-query regressions detectable
round over round — a query that silently triples in cost shows up in
the BENCH_r{N}.json diff, not just in suite totals.

Output: {"metric": "total_wall_sec", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))



def main() -> None:
    # Measure operators, not oracle plumbing: a handful of registry
    # entries write hash side tables so the DuckDB oracle can replay
    # seeded hashes (see __spark_entry__._oracle_side_write). bench
    # runs only the Spark side, so those writes are pure overhead here
    # — skip them. Correctness harnesses never set this flag.
    os.environ.setdefault("SPARK_GRAFT_SKIP_ORACLE_SIDE_WRITE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from etl_gcp_spark.session import get_spark

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    # NAME-SORTED, not registry order: the correctness-window rotation
    # reorders the registry every round, and bench order used to
    # follow it — so each entry's in-suite number moved with its
    # POSITION (block-manager/GC debt from whatever ran before it),
    # producing spurious >1.5x bench_diff flags after every rotation
    # (r8: bm25_index_topk 6.0 s in-suite vs 2.2 s isolated, purely
    # positional). Sorted order is stable across rotations, so
    # round-over-round diffs compare like positions. One-time switch,
    # recorded in the "order" field; bench_diff NOTEs on it.
    bench_queries = sorted(registry)
    # SPARK_GRAFT_BENCH_ONLY=a,b,c — isolated-protocol runs (quiet
    # host, one entry or a small set, usually with
    # SPARK_GRAFT_BENCH_REPEAT=5) used to disposition in-suite
    # movers; the resulting BENCH_LOCAL.json is a partial document,
    # so never commit it as a round close artifact.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = [q.strip() for q in only.split(",") if q.strip()]
        missing = [q for q in wanted if q not in registry]
        if missing:
            raise SystemExit(f"unknown bench queries: {missing}")
        bench_queries = wanted

    # warm-up: executor threads, codegen compiler, parquet footer cache —
    # session initialization should not be charged to the first query.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1
    ).collect()
    # ...and the Python/Arrow worker pool: the first mapInPandas in a
    # session spawns the daemon workers (~3-5 s on local[32]) — spawn
    # them here so the first Arrow-kernel query isn't charged for it
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # ...and one real (unmeasured) registry query end-to-end: the first
    # query of the sweep otherwise pays residual session warm-up that
    # min-of-N inside the same position can't cancel (the round-3
    # events_json_extract 2.2x artifact was positional, not a plan
    # change — its physical plan was identical across rounds).
    registry[bench_queries[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    # median-of-N per query (VERDICT r5 item 3): the first execution
    # pays whole-stage-codegen compilation, so the median discards
    # both that cold run and any lucky-fast outlier — shared-query
    # round-over-round ratios stop carrying the ±10% host ambient
    # that min-of-2 let through. Repeats are ADAPTIVE: sub-second
    # queries get 5 runs instead of 3, because at that duration a
    # single scheduler hiccup moves the 3-run median by >1.5× (four
    # same-code gate runs flagged only sub-second entries); the extra
    # runs cost <2 s each and kill that noise class at the source.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    cheap_repeat = max(repeat, 5)
    from etl_gcp_spark import metering

    timings: dict[str, float] = {}
    splits: dict[str, dict[str, float]] = {}
    t_total = time.perf_counter()
    for name in bench_queries:
        fn = registry[name]
        # hermetic per-query steady state: operators that persist()
        # internal indexes (the dedup family) leak cache entries and
        # localCheckpoint blocks across the suite; dropping them (and
        # nudging the driver GC so ContextCleaner releases the RDD
        # blocks) keeps later queries from paying earlier queries'
        # block-manager debt (measured: dedup_clusters 16 s → ~3 s
        # when isolated).
        spark.catalog.clearCache()
        import gc as _gc

        _gc.collect()
        runs: list[tuple[float, float, float]] = []  # (total, build, verify)
        n_runs = repeat
        while len(runs) < n_runs:
            metering.reset()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            phases = metering.snapshot()
            runs.append(
                (elapsed, phases.get("build", 0.0), phases.get("verify", 0.0))
            )
            # decide the repeat count on the WARM second run (ADVICE
            # r6): the first run pays whole-stage-codegen compilation,
            # so a steady-state sub-second query can read >1 s cold
            # and would miss the 5-run treatment it exists for.
            if len(runs) == 2 and min(r[0] for r in runs) < 1.0:
                n_runs = cheap_repeat
        runs.sort(key=lambda r: r[0])
        med_total, med_build, med_verify = runs[len(runs) // 2]
        timings[name] = round(med_total, 3)
        if med_build > 0.0 or med_verify > 0.0:
            # persisted-index entry: split the median run into index
            # BUILD (train + partitioned write / streaming ingest —
            # a rare batch job at scale), VERIFY (an audit's full-
            # recompute comparison leg — exists only to prove the
            # maintained artifact correct, VERDICT r7 item 4) and
            # SERVE (the partition-pruned query / maintenance path —
            # the 100-TB-relevant latency)
            splits[name] = {
                "build_sec": round(med_build, 3),
                "serve_sec": round(
                    max(med_total - med_build - med_verify, 0.0), 3
                ),
            }
            if med_verify > 0.0:
                splits[name]["verify_sec"] = round(med_verify, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    wall = round(time.perf_counter() - t_total, 3)
    # headline = sum of per-query median-of-N times: the steady-state
    # suite cost; wall_sec additionally includes the other repeats
    total = round(sum(timings.values()), 3)

    # The round driver records only the TAIL of this line, so field
    # order is survival order: per-query timings sorted ASCENDING by
    # time (cheap ones truncate first, expensive ones — the ones worth
    # auditing — survive), summary scalars last. The full untruncated
    # result additionally lands in BENCH_LOCAL.json for diffing with
    # scripts/bench_diff.py.
    result = {
        "metric": "total_wall_sec",
        "unit": "sec",
        # repeat<=1 never reaches the warm-run adaptive decision (the
        # loop exits first) — don't claim adaptive treatment for it
        "repeat": (
            f"{repeat}/{cheap_repeat}-adaptive" if repeat >= 2 else str(repeat)
        ),
        "stat": "median",
        "order": "name-sorted",
        "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
        "index_splits": splits,
        "n_queries": len(timings),
        "value": total,
        "wall_sec": wall,
        "sf": sf,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"),
            "w",
        ) as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries everything
    print(json.dumps(result))


if __name__ == "__main__":
    main()
