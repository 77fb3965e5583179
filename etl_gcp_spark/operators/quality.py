"""One-pass quality metrics + threshold gates (SURVEY.md §2.4).

The reference's validator ships one multi-aggregate SQL query to
BigQuery — COUNT(*), COUNT(DISTINCT col)×3, COUNTIF(col IS NULL)×3 in
a single scan (data_validator.py:88-98) — then thresholds the results
in Python and exits 0/1 (data_validator.py:126-132, :214-219). Here:

- :func:`quality_metrics` builds the same single-scan multi-aggregate
  as ONE ``df.agg`` (Catalyst collapses it into one hash aggregate
  with map-side partials — the distributed analog of the reference's
  warehouse pushdown).
- :func:`quality_gate` turns thresholds into a report DataFrame;
  :func:`gate_exit_code` reproduces the 0/1 process contract (R4).

``distinct`` counts are exact by default; pass ``approx=True`` to use
HyperLogLog (``approx_count_distinct``) — at 100 TB an exact
count-distinct per column is a full shuffle each, while HLL sketches
merge map-side in one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(
    df: DataFrame,
    *,
    distinct_cols: list[str] = (),
    null_cols: list[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Single-row, single-pass quality profile of a DataFrame."""
    cd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("row_count")]
    aggs += [cd(F.col(c)).cast("long").alias(f"distinct_{c}") for c in distinct_cols]
    aggs += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in null_cols
    ]
    return df.agg(*aggs)


@dataclass(frozen=True)
class Threshold:
    """minimum acceptable value for a metric column (A8 semantics)."""

    metric: str
    minimum: float


def quality_gate(metrics: DataFrame, thresholds: list[Threshold]) -> DataFrame:
    """Expand a 1-row metrics frame into a (check, value, threshold,
    passed) report — the reference's threshold table
    (data_validator.py:126-132) as data instead of log lines."""
    if not thresholds:
        # explode(array()) would be VOID-typed; return an empty,
        # correctly-typed report instead
        return metrics.sparkSession.createDataFrame(
            [], "check string, value double, threshold double, passed boolean"
        )
    rows = []
    for t in thresholds:
        rows.append(
            F.struct(
                F.lit(t.metric).alias("check"),
                F.col(t.metric).cast("double").alias("value"),
                F.lit(float(t.minimum)).alias("threshold"),
                (F.col(t.metric) >= F.lit(t.minimum)).alias("passed"),
            )
        )
    return metrics.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.check", "r.value", "r.threshold", "r.passed"
    )


def gate_exit_code(report: DataFrame) -> int:
    """R4: 0 if every check passed, else 1 (data_validator.py:214-219)."""
    failed = report.filter(~F.col("passed")).limit(1).count()
    return 1 if failed else 0


def freshness(
    df: DataFrame,
    ts_col: str,
    *,
    as_of,
    max_age_hours: float = 24.0,
) -> DataFrame:
    """A6: data-freshness gate (documented in the reference's
    monitoring queries — README.md:296-303, FLOW_DIAGRAMS.md:175-178 —
    but absent from its validator; implemented here as a first-class
    check).

    One aggregation: latest event time, its age in hours relative to
    ``as_of``, and the pass flag. ``as_of`` is explicit (a datetime)
    so results are deterministic and testable; production callers
    pass ``datetime.now(UTC)``.
    """
    ref_us = F.unix_micros(F.lit(as_of).cast("timestamp"))
    latest = F.max(F.col(ts_col))
    age_h = (ref_us - F.unix_micros(latest)) / F.lit(3.6e9)
    return df.agg(
        latest.alias("latest_ts"),
        F.round(age_h, 4).alias("age_hours"),
        (age_h <= F.lit(float(max_age_hours))).alias("fresh"),
    )
