"""Exact deduplication operators (reference parity, SURVEY.md §2.3).

- D1 full-row dedup keep-first: the reference deletes all but
  ``MIN(ctid)`` per whole-row group (data_loader.py:301-311). A
  physical row-id has no stable meaning after the reference's own
  unordered pagination (SURVEY.md §2.1-S9), so the faithful Spark
  semantics are: keep-any (``dropDuplicates``) or keep-first by an
  EXPLICIT tiebreaker (:func:`dedup_keep_first`).
- D2 duplicate-count metric (data_loader.py:368-371) — computed
  globally, not per-10K-chunk as the reference does (intentional
  correction, SURVEY.md §3.2).

Scale: ``dropDuplicates`` is a hash aggregate on all columns — one
shuffle with map-side partial aggregation. For wide rows, prefer
:func:`dedup_keep_first` on a key subset (shuffles only the key), or
pre-hash wide payloads (``xxhash64``) so the shuffle carries 8 bytes
per row instead of the payload: that is what
``exact_text_dedup`` in :mod:`etl_gcp_spark.operators.text_dedup`
does for documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D1: drop duplicate rows (keep-any), optionally on a key subset."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """D1 explicit form: keep the first row per key group.

    ``row_number() OVER (PARTITION BY keys ORDER BY order_by) = 1`` —
    the deterministic analog of the reference's ``MIN(ctid)`` keeper.
    One shuffle on ``keys``; AQE handles skewed groups.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dup_count(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D2: single-row DataFrame with the number of surplus duplicate rows.

    Computed as ``sum(count_per_group - 1)`` over groups with
    duplicates — one aggregation pass, no second scan, equivalent to
    ``count(*) - count(distinct *)`` but cheaper at scale because the
    partial aggregate combines map-side.
    """
    cols = subset or df.columns
    per_group = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_group.agg(
        F.coalesce(
            F.sum(F.col("__n") - F.lit(1)), F.lit(0).cast("long")
        ).alias("dup_count")
    )
