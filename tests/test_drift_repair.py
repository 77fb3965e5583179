"""Drift detection (PSI) and robust repair (group-mean impute, MAD
outliers) contracts."""

from __future__ import annotations

import math

from pyspark.sql import Row

from etl_gcp_spark.operators.clean import impute_group_mean, mad_outliers
from etl_gcp_spark.operators.drift import psi_categorical, psi_numeric, psi_report


def test_psi_identical_distributions_near_zero(spark):
    df = spark.createDataFrame(
        [Row(v=float(i % 10), c=str(i % 3)) for i in range(1000)]
    )
    out = {
        r.col_name: r
        for r in psi_report(
            df, df, numeric_cols=("v",), cat_cols=("c",)
        ).collect()
    }
    # same data both sides -> shares identical -> every term is 0
    assert out["v"].psi == 0.0 and not out["v"].drifted
    assert out["c"].psi == 0.0 and not out["c"].drifted


def test_psi_shifted_distribution_flags(spark):
    ref = spark.createDataFrame([Row(v=float(i % 100)) for i in range(2000)])
    cur = spark.createDataFrame(
        [Row(v=float(i % 100) + 80.0) for i in range(2000)]
    )
    (row,) = psi_numeric(ref, cur, "v").collect()
    assert row.psi > 0.2 and row.drifted


def test_psi_categorical_hand_computed(spark):
    ref = spark.createDataFrame([Row(c="a")] * 90 + [Row(c="b")] * 10)
    cur = spark.createDataFrame([Row(c="a")] * 50 + [Row(c="b")] * 50)
    (row,) = psi_categorical(ref, cur, "c").collect()
    p_a, p_b = 90.5 / 101.0, 10.5 / 101.0
    q_a, q_b = 50.5 / 101.0, 50.5 / 101.0
    expect = round(
        round((q_a - p_a) * math.log(q_a / p_a), 6)
        + round((q_b - p_b) * math.log(q_b / p_b), 6),
        6,
    )
    assert row.psi == expect


def test_impute_group_mean_values(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, g="x", v=10.0),
            Row(k=2, g="x", v=None),
            Row(k=3, g="x", v=20.0),
            Row(k=4, g="y", v=None),  # all-NULL group -> global mean
        ]
    )
    out = {r.k: r.v_f for r in impute_group_mean(df, "v", group_col="g").collect()}
    assert out[1] == 10.0 and out[3] == 20.0
    assert out[2] == 15.0          # group mean
    assert out[4] == 15.0          # global mean fallback
    assert len(out) == 4


def test_mad_outliers_robust_to_contamination(spark):
    # 99 inliers at 100 +/- small, one huge outlier: MAD flags exactly
    # the outlier; a zscore screen's sigma would be inflated by it
    rows = [Row(g="a", v=100.0 + (i % 5)) for i in range(99)] + [
        Row(g="a", v=10_000.0)
    ]
    (r,) = mad_outliers(spark.createDataFrame(rows), "v", group_col="g").collect()
    assert r.n == 100 and r.n_outliers == 1
    assert r.med == 102.0 and r.mad == 1.0


def test_mad_zero_for_constant_group(spark):
    rows = [Row(g="c", v=5.0)] * 10
    (r,) = mad_outliers(spark.createDataFrame(rows), "v", group_col="g").collect()
    assert r.mad == 0.0 and r.n_outliers == 0


def test_ks_identical_distributions_zero(spark):
    from etl_gcp_spark.operators.drift import ks_numeric

    df = spark.createDataFrame(
        [(v,) for v in [10, 20, 20, 30, 40, 40, 50]], "x long"
    )
    row = ks_numeric(df, df, "x").collect()[0]
    assert row.ks_stat == 0.0
    assert row.n_ref == row.n_cur == 7


def test_ks_disjoint_distributions_one(spark):
    from etl_gcp_spark.operators.drift import ks_numeric

    a = spark.createDataFrame([(v,) for v in [1, 2, 3]], "x long")
    b = spark.createDataFrame([(v,) for v in [10, 11, 12]], "x long")
    row = ks_numeric(a, b, "x").collect()[0]
    # CDFs fully separate: gap hits 1 at the end of the ref support
    assert row.ks_stat == 1.0
    assert row.at_value == 3


def test_ks_hand_computed(spark):
    from etl_gcp_spark.operators.drift import ks_numeric

    # ref: {1,1,2,3}; cur: {2,3,3,4}
    # at v=1: |2/4 - 0/4| = .5  <- max, smallest value wins ties
    # at v=2: |3/4 - 1/4| = .5
    # at v=3: |4/4 - 3/4| = .25 ; v=4: 0
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(2,), (3,), (3,), (4,)], "x long")
    row = ks_numeric(a, b, "x").collect()[0]
    assert row.ks_stat == 0.5
    assert row.at_value == 1
