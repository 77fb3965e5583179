"""The reference's end-to-end pipeline as one lazy Spark application.

The reference runs three sequential processes — extractor (API → GCS
chunks → PG staging), loader (PG → clean/dedup/validate → BigQuery),
validator (BQ quality checks → exit code) — each materializing to
remote storage between stages (SURVEY.md §3). Here the same dataflow
is one composable function over DataFrames, with bronze/silver/gold
Parquet layers standing in for GCS/PG/BQ:

    bronze  = ingested, columns normalized          (extractor parity)
    silver  = cleaned + deduplicated + audit-stamped (loader parity)
    gold    = silver (published) + quality report    (validator parity)

Stage isolation is OPTIONAL (``materialize=``): by default the whole
flow is a single lazy plan Catalyst optimizes end to end — one scan,
no intermediate I/O; with materialization each layer is written
atomically so stages can restart independently, which is all the
reference's process split actually bought it.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from etl_gcp_spark.operators.clean import audit_stamp, clean, normalize_columns
from etl_gcp_spark.operators.dedup import dedup
from etl_gcp_spark.operators.quality import (
    Threshold,
    gate_exit_code,
    quality_gate,
    quality_metrics,
)
from etl_gcp_spark.operators.validate import Rule, violations
from etl_gcp_spark.sinks.writers import write_table


@dataclass
class PipelineResult:
    """Outputs of one pipeline run (all DataFrames lazy unless
    ``materialize`` was set)."""

    gold: DataFrame
    violations: DataFrame
    report: DataFrame
    exit_code: int
    paths: dict[str, str] = field(default_factory=dict)


def run_pipeline(
    source: DataFrame,
    *,
    rules: list[Rule] | None = None,
    thresholds: list[Threshold] | None = None,
    distinct_cols: list[str] | None = None,
    null_cols: list[str] | None = None,
    dedup_subset: list[str] | None = None,
    fixed_time: _dt.datetime | None = None,
    materialize: str | None = None,
) -> PipelineResult:
    """Ingest → normalize → clean → dedup → stamp → validate → gate.

    Mirrors the reference flow exactly (each step cites its SURVEY.md
    operator) but as ONE lazy plan: Catalyst pushes the cleaning
    projection into the scan, the dedup is the only shuffle, and the
    quality aggregation reuses the deduplicated result. ``rules``
    violations are reported, not dropped — the reference likewise
    exports anomalies without filtering them (data_loader.py:379-384).

    ``materialize='/path'`` writes bronze/silver/gold Parquet layers
    (atomic overwrite each), restoring the reference's stage-restart
    isolation when wanted.
    """
    spark = source.sparkSession

    bronze = normalize_columns(source)                       # P1
    silver = audit_stamp(                                    # P7
        dedup(clean(bronze), dedup_subset),                  # P3-P6, D1
        fixed_time=fixed_time,
    )
    paths: dict[str, str] = {}
    if materialize:
        paths = {
            "bronze": f"{materialize}/bronze",
            "silver": f"{materialize}/silver",
            "gold": f"{materialize}/gold",
        }
        write_table(bronze, paths["bronze"])                 # S6 staging
        write_table(silver, paths["silver"])                 # S10 warehouse
        silver = spark.read.parquet(paths["silver"])

    bad = violations(silver, rules or [])                    # P10-P14
    metrics = quality_metrics(                               # A1-A7
        silver,
        distinct_cols=distinct_cols or [],
        null_cols=null_cols or [],
    )
    report = quality_gate(metrics, thresholds or [])         # A8
    code = gate_exit_code(report) if thresholds else 0       # R4

    gold = silver
    if materialize:
        write_table(gold, paths["gold"])
        gold = spark.read.parquet(paths["gold"])
    return PipelineResult(
        gold=gold,
        violations=bad,
        report=report,
        exit_code=code,
        paths=paths,
    )
