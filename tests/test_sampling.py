"""Deterministic-sampling contracts: repeatability, universe-join
coherence, per-stratum thresholds."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gcp_spark.operators.sampling import (
    hash_bucket,
    sampled_join_revenue,
    stratified_sample,
    universe_sample,
)


def _orders(spark, n=2000):
    return spark.range(1, n + 1).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") % 3 == 0, "1-URGENT")
        .when(F.col("id") % 3 == 1, "3-MEDIUM")
        .otherwise("5-LOW")
        .alias("o_orderpriority"),
    )


def test_universe_sample_is_deterministic(spark):
    df = _orders(spark)
    a = sorted(r[0] for r in universe_sample(df, "o_orderkey", 0.1).collect())
    b = sorted(r[0] for r in universe_sample(df, "o_orderkey", 0.1).collect())
    assert a == b and 0 < len(a) < 2000


def test_universe_sample_fraction_roughly_holds(spark):
    df = spark.range(1, 20001).select(F.col("id").alias("k"))
    kept = universe_sample(df, "k", 0.1).count()
    assert 1600 <= kept <= 2400  # 10% ± 2%


def test_universe_join_keeps_whole_keys(spark):
    # every order surviving the sample must keep ALL its lineitems:
    # sample(A) ⋈ sample(B) on the hashed key loses no partial groups.
    orders = _orders(spark, 500)
    lineitem = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.explode(F.array(F.lit(1.0), F.lit(2.0))).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
    )
    est = sampled_join_revenue(orders, lineitem, fraction=0.2)
    per_key = (
        universe_sample(orders, "o_orderkey", 0.2)
        .join(
            universe_sample(lineitem, "l_orderkey", 0.2),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .count()
    )
    # 2 lineitems per order, never 1 (a partial group would mean the
    # two sides disagreed about a key)
    assert {r["count"] for r in per_key.collect()} == {2}
    assert est.count() > 0


def test_stratified_thresholds_respected(spark):
    df = _orders(spark, 3000)
    out = stratified_sample(
        df,
        "o_orderkey",
        "o_orderpriority",
        {"1-URGENT": 1.0, "3-MEDIUM": 0.5},
    )
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in out.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    assert counts["1-URGENT"] == 1000  # fraction 1.0 keeps everything
    assert 350 <= counts.get("3-MEDIUM", 0) <= 650
    assert "5-LOW" not in counts  # default fraction 0 drops the stratum


def test_hash_bucket_matches_reference_formula(spark):
    rows = (
        spark.range(1, 100)
        .select(F.col("id"), hash_bucket(F.col("id"), 10_000).alias("b"))
        .collect()
    )
    for r in rows:
        assert r["b"] == (r["id"] * 48271) % 2147483647 % 10000


def test_train_test_split_partitions_all_rows_by_key(spark):
    from etl_gcp_spark.operators.sampling import train_test_split

    df = _orders(spark, 5000)
    out = train_test_split(df, "o_orderkey", test_fraction=0.2)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == 5000
    assert 800 <= counts["test"] <= 1200
    # stable across recomputation
    again = train_test_split(df, "o_orderkey", test_fraction=0.2)
    assert out.filter("split = 'test'").count() == again.filter("split = 'test'").count()


def test_temporal_split_embargo_bounds(spark):
    from etl_gcp_spark.operators.sampling import temporal_split

    df = spark.createDataFrame(
        [
            (1, "2020-01-01"),
            (2, "2020-06-30"),
            (3, "2020-07-05"),
            (4, "2020-08-15"),
        ],
        "id long, d string",
    ).select("id", F.to_timestamp("d").alias("d"))
    out = {
        r.id: r.split
        for r in temporal_split(
            df, "d", cutoff="2020-06-30", embargo_days=30, id_col="id"
        ).collect()
    }
    # cutoff day itself trains; inside the 30-day shoulder -> embargo
    assert out == {1: "train", 2: "train", 3: "embargo", 4: "test"}


def test_kfold_assign_grouped_and_deterministic(spark):
    from etl_gcp_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame(
        [(k, f"s{k % 2}") for k in range(200) for _ in range(2)],
        "key long, status string",
    )
    rows = kfold_assign(df, "key", k=5).collect()
    folds = {}
    for r in rows:
        folds.setdefault(r.key, set()).add(r.fold)
    # grouped: every key maps to exactly one fold
    assert all(len(v) == 1 for v in folds.values())
    assert set().union(*folds.values()) <= set(range(5))
    # deterministic across invocations/partitionings
    again = {r.key: r.fold for r in
             kfold_assign(df.repartition(7), "key", k=5).collect()}
    assert all(again[k] == next(iter(v)) for k, v in folds.items())


def test_temporal_split_null_time_embargoed(spark):
    from etl_gcp_spark.operators.sampling import temporal_split

    df = spark.createDataFrame(
        [(1, "2020-01-01"), (2, None)], "id long, d string"
    ).select("id", F.to_timestamp("d").alias("d"))
    out = {r.id: r.split for r in temporal_split(
        df, "d", cutoff="2020-06-30", id_col="id").collect()}
    # unknown time must never reach the test split
    assert out[2] == "embargo"


def test_priority_sample_fixed_size_and_estimator(spark):
    from etl_gcp_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "k long, w double"
    )
    out = priority_sample(df, "k", "w", 10).collect()
    assert len(out) == 10                      # fixed-size, not coin flips
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, 11)
    )
    # every estimate is max(weight, tau) for ONE shared tau > 0
    taus = {r.est_weight for r in out if r.est_weight != r.weight}
    assert len(taus) <= 1
    # deterministic: same frame, same sample
    again = priority_sample(df, "k", "w", 10).collect()
    assert {r.key for r in out} == {r.key for r in again}


def test_priority_sample_dominant_weight_always_kept(spark):
    from etl_gcp_spark.operators.sampling import priority_sample

    # q = w/u with u >= 1/(2^31-1): a weight > (2^31)x the rest has a
    # larger priority than any competitor can reach -> always sampled
    rows = [(i, 1.0) for i in range(1, 50)] + [(999, 1.0e12)]
    df = spark.createDataFrame(rows, "k long, w double")
    kept = {r.key for r in priority_sample(df, "k", "w", 3).collect()}
    assert 999 in kept


def test_priority_sample_small_population_kept_exactly(spark):
    from etl_gcp_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 0.0), (4, None)], "k long, w double"
    )
    out = {r.key: r for r in priority_sample(df, "k", "w", 10).collect()}
    # zero/NULL weights excluded; population <= k -> tau = 0, est == w
    assert set(out) == {1, 2}
    assert out[1].est_weight == 5.0 and out[2].est_weight == 7.0


def test_ann_recall_report_matches_manual_overlap(spark, sf_dir):
    from etl_gcp_spark.functions.similarity import (
        ann_recall_report,
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = list(range(5))
    got = {
        r.query_id: (r.n_exact, r.n_hits, r.recall)
        for r in ann_recall_report(
            emb, query_ids=qids, k=5, n_cells=8, n_probe=2
        ).collect()
    }
    exact = cosine_topk(
        emb, query_filter=F.col("vec_id").isin(qids), k=5
    ).collect()
    approx = ivf_topk(
        emb, query_ids=qids, k=5, n_cells=8, n_probe=2
    ).collect()
    e = {}
    for r in exact:
        e.setdefault(r.query_id, set()).add(r.neighbor_id)
    a = {}
    for r in approx:
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    for q in e:
        hits = len(e[q] & a.get(q, set()))
        assert got[q] == (len(e[q]), hits, round(hits / len(e[q]), 4))
        assert 0.0 <= got[q][2] <= 1.0


def test_epoch_shards_deterministic_permutation(spark):
    from pyspark.sql import Row

    from etl_gcp_spark.operators.sampling import epoch_shards

    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in range(100)] + [Row(doc_id=None)]
    )
    a = epoch_shards(docs, epoch=3, n_shards=4).collect()
    b = epoch_shards(docs, epoch=3, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # repeatable
    assert len(a) == 100  # NULL id excluded
    # positions are contiguous 1..n within each shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different epoch yields a different training order
    c = epoch_shards(docs, epoch=4, n_shards=4).collect()
    order_a = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.pos))]
    order_c = [r.doc_id for r in sorted(c, key=lambda r: (r.shard, r.pos))]
    assert order_a != order_c
    assert sorted(order_a) == sorted(order_c) == list(range(100))
