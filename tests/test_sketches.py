"""Count-min sketch guarantees and per-source cap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark):
    # skewed: key 7 hot (50x), keys 0..99 cold (1x each)
    rows = [(7,)] * 50 + [(k,) for k in range(100)]
    return spark.createDataFrame(rows, "user_id long")


def test_cms_never_underestimates(spark):
    from etl_gcp_spark.functions.sketches import cms_point_queries

    out = cms_point_queries(
        _events(spark), "user_id", list(range(0, 100, 7)) + [7, 424242]
    ).collect()
    assert all(r.est_count >= r.true_count for r in out)
    hot = [r for r in out if r.key == 7][0]
    assert hot.true_count == 51
    # width 256 vs 101 keys: the hot key's min-counter is near-exact
    assert hot.est_count <= hot.true_count + 5


def test_cms_absent_key_truth_zero(spark):
    from etl_gcp_spark.functions.sketches import cms_point_queries

    out = {
        r.key: r
        for r in cms_point_queries(
            _events(spark), "user_id", [424242]
        ).collect()
    }
    assert out[424242].true_count == 0
    assert out[424242].est_count >= 0


def test_cms_counters_merge_by_addition(spark):
    from etl_gcp_spark.functions.sketches import cms_build

    # sketch(A ∪ B) == sketch(A) + sketch(B), counter-wise — the
    # property that makes CMS a partition/day-mergeable pre-aggregate
    a = spark.createDataFrame([(k,) for k in range(50)], "user_id long")
    b = spark.createDataFrame([(k,) for k in range(50, 100)], "user_id long")
    merged = (
        cms_build(a, "user_id")
        .unionByName(cms_build(b, "user_id"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    exact = {
        (r.row, r.bucket): r.cnt
        for r in cms_build(a.unionByName(b), "user_id").collect()
    }
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert exact == got


def test_per_source_cap(spark):
    from etl_gcp_spark.operators.corpus import per_source_cap

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(10)], "doc_id long, source string"
    )
    out = per_source_cap(docs, cap=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert sorted(by_src["s0"]) == [0, 2, 4]
    assert sorted(by_src["s1"]) == [1, 3, 5]


def test_streaming_cms_equals_batch(spark):
    from etl_gcp_spark.functions.sketches import cms_point_queries
    from etl_gcp_spark.streaming.events import run_streaming_cms

    df = _events(spark)
    keys = [0, 7, 50, 999]
    batch = {
        r.key: (r.est_count, r.true_count)
        for r in cms_point_queries(df, "user_id", keys).collect()
    }
    streamed = {
        r.key: (r.est_count, r.true_count)
        for r in run_streaming_cms(
            spark, df, keys, n_batches=3
        ).collect()
    }
    assert batch == streamed


def test_hll_replayable_accuracy_and_mergeability(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gcp_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    regs = hll_registers(orders, "o_custkey", "o_orderpriority")
    est = {
        r.grp: r.est_distinct for r in hll_estimate(regs).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        rel = abs(est[g] - n) / n
        assert rel < 0.25, f"{g}: est {est[g]} vs exact {n} ({rel:.1%})"

    # mergeability: registers from two disjoint halves, unioned, give
    # EXACTLY the whole-table estimate (max is associative — the
    # property that lets per-day/per-executor sketches combine)
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = hll_registers(lo, "o_custkey", "o_orderpriority").union(
        hll_registers(hi, "o_custkey", "o_orderpriority")
    )
    est_merged = {
        r.grp: r.est_distinct for r in hll_estimate(merged).collect()
    }
    assert est_merged == est


def test_hll_overlap_inclusion_exclusion_sanity(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gcp_spark.functions.sketches import hll_overlap

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = hll_overlap(
        orders, "o_custkey", "o_orderpriority", "1-URGENT", "5-LOW"
    ).collect()[0]
    a = {
        r.o_custkey
        for r in orders.filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_custkey").distinct().collect()
    }
    b = {
        r.o_custkey
        for r in orders.filter(
            F.col("o_orderpriority") == "5-LOW"
        ).select("o_custkey").distinct().collect()
    }
    union = len(a | b)
    # component and union estimates within HLL error at m=128;
    # the intersection inherits BOTH sides' error, so its band is
    # relative to the union size (the inclusion-exclusion magnitude)
    assert abs(row.est_a - len(a)) / len(a) < 0.25
    assert abs(row.est_b - len(b)) / len(b) < 0.25
    assert abs(row.est_union - union) / union < 0.25
    assert abs(row.est_intersection - len(a & b)) <= 0.3 * union


def test_streaming_cms_recovers_from_mid_stream_crash(spark, tmp_path):
    import pytest

    from etl_gcp_spark.functions.sketches import cms_point_queries
    from etl_gcp_spark.streaming.events import run_streaming_cms

    df = _events(spark)
    keys = [0, 7, 50, 999]
    root = str(tmp_path / "scms_recovery")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_cms(
            spark, df, keys, n_batches=3, root=root, fail_after_batches=2
        )
    streamed = {
        r.key: (r.est_count, r.true_count)
        for r in run_streaming_cms(
            spark, df, keys, n_batches=3, root=root
        ).collect()
    }
    batch = {
        r.key: (r.est_count, r.true_count)
        for r in cms_point_queries(df, "user_id", keys).collect()
    }
    # the replayed batch rewrote its own counter partial: no double
    # counting, the resumed sketch is bit-identical to the batch build
    assert streamed == batch


def test_streaming_topk_recovers_from_mid_stream_crash(
    spark, sf_dir, tmp_path
):
    import pytest
    from pyspark.sql import functions as F

    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_topk

    events = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "stopk_recovery")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_topk(
            spark, events, k=5, root=root, fail_after_batches=2
        )
    got = [
        (r.event_type, r.n_events)
        for r in run_streaming_topk(spark, events, k=5, root=root)
        .collect()
    ]
    want = [
        (r.event_type, r.n)
        for r in events.filter(
            F.col("event_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "event_type")
        .limit(5)
        .collect()
    ]
    assert got == want


def test_histogram_quantiles_error_bound_and_degenerate(spark):
    """Every estimate lands within one bin width of the exact
    quantile; a constant column returns the constant for all qs."""
    import numpy as np

    from etl_gcp_spark.functions.sketches import histogram_quantiles

    rng = np.random.default_rng(7)
    xs = sorted(float(x) for x in rng.normal(100.0, 25.0, 5000))
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    out = {r.q: r.est for r in histogram_quantiles(
        df, "v", n_bins=128, qs=(0.5, 0.95, 0.99)
    ).collect()}
    width = (max(xs) - min(xs)) / 128
    for q, est in out.items():
        exact = xs[int(np.ceil(q * len(xs))) - 1]
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)
    const = spark.createDataFrame([(42.0,)] * 10, "v double")
    cout = {r.q: (r.est, r.n_values) for r in histogram_quantiles(
        const, "v", qs=(0.5, 0.99)
    ).collect()}
    assert cout == {0.5: (42.0, 10), 0.99: (42.0, 10)}


def test_fixed_grid_bins_match_batch_walk(spark):
    """quantiles_from_bins over split partials == one-shot build over
    the union (merge-by-addition), and clamping pins out-of-domain
    values to the edge bins."""
    from etl_gcp_spark.functions.sketches import (
        histogram_bins,
        quantiles_from_bins,
    )

    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    b = spark.createDataFrame(
        [(float(i),) for i in range(100, 200)] + [(-50.0,), (1e9,)],
        "x double",
    )
    union = a.union(b)
    one_shot = quantiles_from_bins(
        histogram_bins(union, "x", lo=0.0, hi=200.0, n_bins=20),
        lo=0.0, hi=200.0, n_bins=20,
    )
    merged = quantiles_from_bins(
        histogram_bins(a, "x", lo=0.0, hi=200.0, n_bins=20).union(
            histogram_bins(b, "x", lo=0.0, hi=200.0, n_bins=20)
        ),
        lo=0.0, hi=200.0, n_bins=20,
    )
    got_one = {r.q: (r.est, r.n_values) for r in one_shot.collect()}
    got_merged = {r.q: (r.est, r.n_values) for r in merged.collect()}
    assert got_one == got_merged
    assert got_one[0.5][1] == 202  # clamped rows still counted
    # median of 0..199 ~ 100; within one 10-unit bin width
    assert abs(got_one[0.5][0] - 100.0) <= 10.0


def test_streaming_quantiles_recovers_from_mid_stream_crash(
    spark, sf_dir, tmp_path
):
    import pytest

    from etl_gcp_spark.functions.sketches import (
        histogram_bins,
        quantiles_from_bins,
    )
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_quantiles

    orders = load_table(spark, sf_dir, "orders")
    root = str(tmp_path / "squant_recovery")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_quantiles(
            spark, orders, root=root, fail_after_batches=2
        )
    streamed = {
        r.q: (r.est, r.n_values)
        for r in run_streaming_quantiles(spark, orders, root=root)
        .collect()
    }
    from pyspark.sql import functions as F

    rows = orders.filter(
        F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    batch = {
        r.q: (r.est, r.n_values)
        for r in quantiles_from_bins(
            histogram_bins(
                rows, "o_totalprice", lo=0.0, hi=640000.0, n_bins=128
            ),
            lo=0.0, hi=640000.0, n_bins=128,
        ).collect()
    }
    # the replayed batch rewrote its own partial: no double counting,
    # the resumed sketch is bit-identical to the batch build
    assert streamed == batch


def test_grouped_quantiles_error_bound(spark, sf_dir):
    """Each per-group estimate lands within one bin width of that
    group's exact percentile."""
    from pyspark.sql import functions as F

    from etl_gcp_spark.functions.sketches import (
        grouped_histogram_quantiles,
    )
    from etl_gcp_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    got = grouped_histogram_quantiles(
        orders, "o_totalprice", "o_orderpriority",
        lo=0.0, hi=640000.0, n_bins=128, qs=(0.5, 0.95),
    ).collect()
    width = 640000.0 / 128
    exact = {
        (r.grp, q): v
        for q in (0.5, 0.95)
        for r, v in (
            (r, r[f"p{q}"])
            for r in orders.groupBy(
                F.col("o_orderpriority").alias("grp")
            ).agg(
                F.percentile("o_totalprice", F.lit(0.5)).alias("p0.5"),
                F.percentile("o_totalprice", F.lit(0.95)).alias("p0.95"),
            ).collect()
        )
    }
    assert len(got) == 10  # 5 priorities x 2 quantiles
    for r in got:
        assert abs(r.est - exact[(r.grp, r.q)]) <= width


def test_cms_join_size_bounds_and_exact_truth(spark):
    from etl_gcp_spark.functions.sketches import cms_join_size

    # skewed key counts: key k appears k times -> truth = sum k^2
    rows = [(k,) for k in range(1, 20) for _ in range(k)]
    df = spark.createDataFrame(rows + [(None,)], "k long")
    r = cms_join_size(df, "k", df, "k").first()
    assert r["true_rows"] == sum(k * k for k in range(1, 20))
    # CMS inner product never underestimates; NULLs excluded
    assert r["est_rows"] >= r["true_rows"]
    assert r["over_ratio"] == r["est_rows"] / r["true_rows"]


def test_cms_join_size_two_sided(spark):
    from etl_gcp_spark.functions.sketches import cms_join_size

    a = spark.createDataFrame([(1,), (1,), (2,), (9,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k long")
    r = cms_join_size(a, "k", b, "k").first()
    # truth: key 1 -> 2*1, key 2 -> 1*2; key 3/9 unmatched
    assert r["true_rows"] == 4
    assert r["est_rows"] >= 4


def test_cms_join_size_disjoint_truth_zero(spark):
    from etl_gcp_spark.functions.sketches import cms_join_size

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(3,), (4,)], "k long")
    r = cms_join_size(a, "k", b, "k").first()
    assert r["true_rows"] == 0
    assert r["est_rows"] >= 0


def test_streaming_hll_recovers_and_equals_batch(spark, sf_dir, tmp_path):
    import pytest

    from etl_gcp_spark.functions.sketches import hll_estimate, hll_registers
    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_hll

    orders = load_table(spark, sf_dir, "orders")
    root = str(tmp_path / "shll_recovery")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_hll(spark, orders, root=root, fail_after_batches=2)
    streamed = {
        r.o_orderpriority: (r.est_distinct, r.n_registers_used)
        for r in run_streaming_hll(spark, orders, root=root).collect()
    }
    batch = {
        r.grp: (r.est_distinct, r.n_registers_used)
        for r in hll_estimate(
            hll_registers(
                orders.filter(F.col("o_custkey").isNotNull()),
                "o_custkey",
                "o_orderpriority",
            )
        ).collect()
    }
    # max-merge is idempotent: the resumed stream's registers — and
    # therefore the estimates — are bit-identical to the batch build
    assert streamed == batch
