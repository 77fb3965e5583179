"""Scale-feature contracts: bucketed co-located joins (zero-exchange
plan), skew salting (same results as plain ops), and plan shapes for
the newer relational operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gcp_spark.operators.relational import (
    large_orders,
    late_shipment_priority,
    price_band_totals,
)
from etl_gcp_spark.operators.skew import salted_count, salted_join
from etl_gcp_spark.sinks.writers import write_bucketed_table
from etl_gcp_spark.sources.readers import load_tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf fixed at session start; managed
    # test tables are dropped (files removed) in the finally block
    left = spark.createDataFrame([Row(k=i, a=i * 2) for i in range(100)])
    right = spark.createDataFrame([Row(k=i, b=i * 3) for i in range(100)])
    write_bucketed_table(left, "bk_left", bucket_cols=["k"], n_buckets=4)
    write_bucketed_table(right, "bk_right", bucket_cols=["k"], n_buckets=4)
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-located: bucket-to-bucket join
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def _skewed(spark):
    # key 0 holds 90% of rows — the pathological shape
    rows = [Row(k=0, v=i) for i in range(900)] + [
        Row(k=i % 10 + 1, v=i) for i in range(100)
    ]
    return spark.createDataFrame(rows)


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(11)])
    plain = large.join(small, "k").groupBy("k").count()
    salted = salted_join(large, small, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_count_matches_plain_count(spark):
    df = _skewed(spark)
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in salted_count(df, "k").collect()}
    assert salted == plain


def test_salted_join_deterministic_salt_matches_plain(spark):
    # salt_from derives the salt from a stable row column (retry-safe);
    # outputs must equal the plain join for inner AND left joins,
    # including the unmatched-left-row case
    large = _skewed(spark)  # keys 0..10; v is unique per row
    small = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(5)])
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, large.join(small, "k", how).select("k", "v", "name").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(large, small, "k", how=how, salt_from="v")
                .select("k", "v", "name")
                .collect(),
            )
        )
        assert salted == plain, how


def test_runtime_filter_join_matches_plain_and_prunes(spark):
    from etl_gcp_spark.operators.runtime_filter import (
        bloom_bitset,
        bloom_probe,
        runtime_filter_join,
    )

    fact = spark.createDataFrame(
        [Row(k=i % 100, v=i) for i in range(2000)]
    )
    dim = spark.createDataFrame([Row(k=i, name=f"d{i}") for i in range(5)])
    plain = sorted(
        map(tuple, fact.join(dim, "k").select("k", "v", "name").collect())
    )
    rf = sorted(
        map(
            tuple,
            runtime_filter_join(fact, dim, "k")
            .select("k", "v", "name")
            .collect(),
        )
    )
    assert rf == plain and len(rf) == 100  # 5 keys × 20 rows each
    # the probe itself must prune hard: ≤ a few false positives on top
    # of the 100 true matches (2 hashes into 2^17 bits over 5 keys)
    bits = bloom_bitset(dim.select("k"), "k")
    pruned = bloom_probe(fact, bits, "k").count()
    assert 100 <= pruned < 200
    # NULL fact keys never survive the probe (they cannot equi-join)
    with_null = fact.union(
        spark.createDataFrame([Row(k=None, v=-1)], fact.schema)
    )
    assert bloom_probe(with_null, bits, "k").filter("k IS NULL").count() == 0


def test_runtime_filter_join_rejects_outer(spark):
    import pytest

    from etl_gcp_spark.operators.runtime_filter import runtime_filter_join

    df = spark.createDataFrame([Row(k=1, v=1)])
    with pytest.raises(ValueError):
        runtime_filter_join(df, df, "k", how="left")


def test_q18_aggregates_before_join(spark, sf_dir):
    """The lineitem aggregate must sit BELOW the joins in the plan
    (filter on total_qty applied pre-join)."""
    t = load_tables(spark, sf_dir)
    plan = _plan(large_orders(t["customer"], t["orders"], t["lineitem"]))
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # executedPlan prints top-down: joins appear before (above) the agg
    assert join_pos < agg_pos


def test_q4_semi_join_no_row_duplication(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    out = late_shipment_priority(t["orders"], t["lineitem"])
    total = out.agg(F.sum("n_orders")).collect()[0][0]
    # semi join counts each order at most once
    assert total <= t["orders"].count()
    assert "LeftSemi" in _plan(out)


def test_price_bands_broadcast_nested_loop(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    plan = _plan(price_band_totals(t["orders"]))
    assert "BroadcastNestedLoopJoin" in plan


def test_hll_sketch_estimate_close_to_exact(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 50_000).selectExpr("id % 1000 AS user", "id")
    row = df.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user))").alias("est"),
        F.count_distinct("user").alias("exact"),
    ).first()
    assert abs(row["est"] - row["exact"]) <= 0.05 * row["exact"]


def test_hll_sketches_merge_across_partitions(spark):
    # mergeability is the point of the sketch: union of per-group
    # sketches == sketch of the union (within estimation error)
    from pyspark.sql import functions as F

    df = spark.range(0, 20_000).selectExpr("id % 4 AS part", "id % 500 AS user")
    merged = (
        df.groupBy("part")
        .agg(F.expr("hll_sketch_agg(user)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .first()["est"]
    )
    assert abs(merged - 500) <= 25


def test_join_explosion_exact_cardinality(spark):
    from etl_gcp_spark.operators.skew import join_explosion_report

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 3]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 9]], "k long"
    )
    out = join_explosion_report(left, right, "k").collect()
    # exact: key 1 -> 3*2=6, key 2 -> 1; key 3/9 don't join
    assert out[0].key == "1" and out[0].out_rows == 6
    assert out[0].total_out_rows == 7 and out[0].n_join_keys == 2
    # equals the true join size
    assert left.join(right, "k").count() == 7
