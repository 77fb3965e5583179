"""Binned range join + funnel/retention contracts."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gcp_spark.operators.events import funnel_stages, retention_cohorts
from etl_gcp_spark.operators.rangejoin import range_join_binned


def test_range_join_matches_naive_theta_join(spark):
    points = spark.range(0, 500).select(F.col("id").alias("p"))
    intervals = spark.createDataFrame(
        [Row(iid=i, s=i * 7, e=i * 7 + 11) for i in range(60)]
    )
    got = sorted(
        (r["p"], r["iid"])
        for r in range_join_binned(
            points, intervals, point_col="p", start_col="s", end_col="e",
            bin_width=8,
        ).collect()
    )
    want = sorted(
        (r["p"], r["iid"])
        for r in points.join(
            intervals, (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))
        ).collect()
    )
    assert got == want and len(got) > 0


def test_range_join_plans_equi_join_not_nested_loop(spark):
    points = spark.range(0, 100).select(F.col("id").alias("p"))
    intervals = spark.createDataFrame([Row(iid=1, s=10, e=20)])
    plan = range_join_binned(
        points, intervals, point_col="p", start_col="s", end_col="e",
        bin_width=16,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_funnel_requires_stage_order(spark):
    rows = [
        # user 1: full ordered funnel
        Row(user_id=1, event_type="signup", ts=_ts(1)),
        Row(user_id=1, event_type="view", ts=_ts(2)),
        Row(user_id=1, event_type="click", ts=_ts(3)),
        Row(user_id=1, event_type="purchase", ts=_ts(4)),
        # user 2: clicked BEFORE viewing -> stops at view
        Row(user_id=2, event_type="signup", ts=_ts(1)),
        Row(user_id=2, event_type="click", ts=_ts(2)),
        Row(user_id=2, event_type="view", ts=_ts(3)),
        # user 3: never signed up -> counts nowhere
        Row(user_id=3, event_type="view", ts=_ts(1)),
        Row(user_id=3, event_type="purchase", ts=_ts(2)),
    ]
    out = {
        r["stage"]: (r["n_users"], r["conversion_pct"])
        for r in funnel_stages(spark.createDataFrame(rows)).collect()
    }
    assert out["signup"] == (2, 100.0)
    assert out["view"] == (2, 100.0)
    assert out["click"] == (1, 50.0)
    assert out["purchase"] == (1, 50.0)


def test_retention_counts_distinct_users_per_offset(spark):
    rows = [
        Row(user_id=1, ts=_ts(1)),   # cohort week of Jan 1 (Monday)
        Row(user_id=1, ts=_ts(2)),   # same week: offset 0, same user
        Row(user_id=1, ts=_ts(10)),  # offset 1
        Row(user_id=2, ts=_ts(3)),   # cohort week 0, only offset 0
        Row(user_id=3, ts=_ts(9)),   # cohort week 1
    ]
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_active"]
        for r in retention_cohorts(spark.createDataFrame(rows)).collect()
    }
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert len(out) == 3
