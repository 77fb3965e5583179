"""CDC / incremental-maintenance operator semantics (operators/cdc.py).

The reference's pipeline is a daily full-refresh CDC load
(data_extractor.py:205-217 chunk naming, data_loader.py:429-433
truncate-then-append); these tests pin the engine-level merge
semantics that replace the rewrite at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gcp_spark.operators.cdc import cdc_upsert, merge_agg_delta, scd2_history


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, 2), (2, "b", 20.0, 2), (3, "c", 30.0, 2)],
        "k int, v string, amt double, _src_rank int",
    )


def test_upsert_update_insert_untouched(spark):
    changes = spark.createDataFrame(
        [(2, "B", 25.0, 1), (4, "d", 40.0, 1)],
        "k int, v string, amt double, _src_rank int",
    )
    out = {
        r["k"]: (r["v"], r["amt"])
        for r in cdc_upsert(_base(spark), changes, ["k"]).collect()
    }
    assert out == {
        1: ("a", 10.0),  # untouched
        2: ("B", 25.0),  # updated (changes rank wins)
        3: ("c", 30.0),  # untouched
        4: ("d", 40.0),  # inserted
    }


def test_upsert_drops_bookkeeping_columns(spark):
    changes = _base(spark).limit(0)
    cols = cdc_upsert(_base(spark), changes, ["k"]).columns
    assert "_src_rank" not in cols and "_rn" not in cols


def test_upsert_single_shuffle_no_join(spark):
    changes = _base(spark).limit(0)
    plan = (
        cdc_upsert(_base(spark), changes, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # merge is union + window, never a join
    assert plan.count("Exchange") == 1  # one shuffle, on the merge key


def test_scd2_interval_chain(spark):
    log = spark.createDataFrame(
        [
            (1, 101, "2024-01-01"),
            (1, 102, "2024-02-01"),
            (1, 103, "2024-03-01"),
            (2, 201, "2024-01-15"),
        ],
        "k int, state int, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    rows = sorted(
        scd2_history(
            log, ["k"], change_time="t", version_of=["state"]
        ).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    # each interval closes at the next state's start; last stays open
    assert [r["state"] for r in rows] == [101, 102, 103, 201]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None and rows[2]["is_current"]
    assert rows[3]["valid_to"] is None and rows[3]["is_current"]
    assert not rows[0]["is_current"] and not rows[1]["is_current"]


def test_scd2_tiebreaker_is_deterministic(spark):
    log = spark.createDataFrame(
        [(1, 9, "2024-01-01"), (1, 3, "2024-01-01")],
        "k int, state int, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    rows = sorted(
        scd2_history(
            log,
            ["k"],
            change_time="t",
            version_of=["state"],
            tiebreakers=["state"],
        ).collect(),
        key=lambda r: r["state"],
    )
    assert rows[0]["state"] == 3 and not rows[0]["is_current"]
    assert rows[1]["state"] == 9 and rows[1]["is_current"]


def test_streaming_upsert_matches_batch_latest(spark, sf_dir):
    import os

    from pyspark.sql import Window

    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_upsert

    got = {
        r["user_id"]: (r["last_event_id"], r["last_ts"])
        for r in run_streaming_upsert(
            spark, os.path.join(sf_dir, "events.parquet"), n_batches=4
        ).collect()
    }
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        r["user_id"]: (r["event_id"], r["ts"])
        for r in events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    # 4 hash-split (time-interleaved) microbatches merged by event time
    # reproduce exactly the batch-computed newest-per-user snapshot
    assert got == want


def test_merge_agg_delta_equals_full_recompute(spark, sf_dir):
    from etl_gcp_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(28,8)")
    )
    cut = F.lit("1997-01-01").cast("timestamp")
    base_agg = (
        orders.filter(F.col("o_orderdate") < cut)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("o_totalprice"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    delta = orders.filter(F.col("o_orderdate") >= cut)
    merged = {
        r["o_orderpriority"]: (r["o_totalprice"], r["n_rows"])
        for r in merge_agg_delta(
            base_agg, delta, ["o_orderpriority"], sum_cols=["o_totalprice"]
        ).collect()
    }
    full = {
        r["o_orderpriority"]: (r["o_totalprice"], r["n_rows"])
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("o_totalprice"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    # decimal sums are exact: delta-merged aggregate == full recompute
    assert merged == full


def test_streaming_upsert_recovers_from_mid_stream_crash(
    spark, sf_dir, tmp_path
):
    """Kill the upsert after trigger 2 of 4 (post-write, pre-commit),
    resume from the checkpoint, and require the final snapshot to
    equal the batch oracle EXACTLY — the property a 100-TB continuous
    ingest actually depends on (round-3 verdict item 6)."""
    import os

    import pytest
    from pyspark.sql import Window

    from etl_gcp_spark.sources.readers import load_table
    from etl_gcp_spark.streaming.events import run_streaming_upsert

    root = str(tmp_path / "upsert_recovery")
    path = os.path.join(sf_dir, "events.parquet")
    with pytest.raises(Exception, match="injected crash"):
        run_streaming_upsert(
            spark, path, n_batches=4, root=root, fail_after_batches=2
        )
    got = {
        r["user_id"]: (r["last_event_id"], r["last_ts"])
        for r in run_streaming_upsert(
            spark, path, n_batches=4, root=root
        ).collect()
    }
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        r["user_id"]: (r["event_id"], r["ts"])
        for r in events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    assert got == want


def test_snapshot_diff_hand_computed(spark):
    from etl_gcp_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "a"),      # unchanged
            (2, 21.0, "B"),      # changed: v AND s
            (3, None, "c"),      # unchanged (NULL == NULL, null-safe)
            (5, 50.0, "e"),      # added; key 4 removed
        ],
        "k long, v double, s string",
    )
    out = {
        r.metric: r.n
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert out == {
        "rows:added": 1,
        "rows:removed": 1,
        "rows:changed": 1,
        "rows:unchanged": 2,
        "col:v": 1,
        "col:s": 1,
    }


def test_cdc_merge_with_deletes_tombstones_and_reinserts(spark):
    """The latest op wins: a trailing delete removes the key, but a
    later upsert re-inserts it — tombstones mask at merge time, they
    don't destroy history. Base rows without an op column are live."""
    from etl_gcp_spark.operators.cdc import cdc_merge_with_deletes

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")],
        "k long, v long, s string",
    )
    changes = spark.createDataFrame(
        [
            (1, 20, "a2", "U"),  # update
            (2, 20, "b2", "D"),  # delete (latest for k=2)
            (3, 20, "c2", "D"),  # delete...
            (3, 30, "c3", "U"),  # ...then re-insert (latest for k=3)
            (4, 20, "d1", "D"),  # delete of a never-seen key: no row
        ],
        "k long, v long, s string, op string",
    )
    out = {
        r.k: (r.v, r.s)
        for r in cdc_merge_with_deletes(
            base, changes, ["k"], order_by=[F.col("v").desc()]
        ).collect()
    }
    assert out == {1: (20, "a2"), 3: (30, "c3")}


def test_golden_record_survivorship_rules(spark):
    import datetime

    from etl_gcp_spark.operators.cdc import golden_record

    t = lambda s: datetime.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1: latest row (s=5) has NULL value -> recency rule
        # falls back to the latest NON-NULL (s=4); type mode is 'b'
        (1, 1, t(1), 10.0, "a"),
        (1, 2, t(2), 20.0, "b"),
        (1, 3, t(4), 30.0, "b"),
        (1, 4, t(5), None, "c"),
        # user 2: ts tie at s=9 -> event_id desc breaks it (id 11)
        (2, 10, t(9), 1.0, "x"),
        (2, 11, t(9), 2.0, "y"),
        # user 3: NULL ts rows drop entirely
        (3, 20, None, 9.0, "z"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "value double, event_type string"
    )
    out = {r.user_id: r for r in golden_record(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].last_value == 30.0
    assert out[1].modal_type == "b"
    assert out[1].n_events == 4
    assert out[1].first_seen == t(1) and out[1].last_seen == t(5)
    assert out[2].last_value == 2.0
    # count tie between 'x' and 'y' -> alphabetical
    assert out[2].modal_type == "x"
