"""End-to-end pipeline contract: the reference's three-process flow
as one call, both fully-lazy and stage-materialized."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gcp_spark.operators.quality import Threshold
from etl_gcp_spark.operators.validate import not_null_rule, range_rule
from etl_gcp_spark.pipeline import run_pipeline

FIXED = dt.datetime(2026, 1, 1)


def _source(spark):
    return spark.createDataFrame(
        [
            Row(**{"Year Start": 2000, "Data.Value": 50.0, "Topic": " Alcohol "}),
            Row(**{"Year Start": 2000, "Data.Value": 50.0, "Topic": " Alcohol "}),
            Row(**{"Year Start": 2001, "Data.Value": 150.0, "Topic": None}),
        ]
    )


def test_pipeline_lazy_end_to_end(spark):
    res = run_pipeline(
        _source(spark),
        rules=[range_rule("data_value", 0, 100), not_null_rule("topic")],
        thresholds=[Threshold("row_count", 1), Threshold("distinct_year_start", 5)],
        distinct_cols=["year_start"],
        null_cols=["topic"],
        fixed_time=FIXED,
    )
    rows = res.gold.collect()
    # dedup collapsed the duplicate; names normalized; strings cleaned
    assert len(rows) == 2
    assert set(res.gold.columns) == {
        "year_start", "data_value", "topic", "loaded_at", "load_date"
    }
    topics = {r.topic for r in rows}
    assert topics == {"alcohol", "unknown"}
    # the bad row violates both rules but appears once
    assert res.violations.count() == 1
    # threshold fails (2 distinct years < 5) -> exit 1
    assert res.exit_code == 1
    got = {r.check: r.passed for r in res.report.collect()}
    assert got == {"row_count": True, "distinct_year_start": False}


def test_pipeline_materialized_layers(spark, tmp_path):
    res = run_pipeline(
        _source(spark),
        thresholds=[Threshold("row_count", 1)],
        fixed_time=FIXED,
        materialize=str(tmp_path / "lake"),
    )
    assert res.exit_code == 0
    # every layer exists and is re-readable
    bronze = spark.read.parquet(res.paths["bronze"])
    silver = spark.read.parquet(res.paths["silver"])
    gold = spark.read.parquet(res.paths["gold"])
    assert bronze.count() == 3          # pre-dedup staging
    assert silver.count() == 2 == gold.count()
    assert "loaded_at" in silver.columns
