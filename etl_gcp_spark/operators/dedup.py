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


def _row_digest(df: DataFrame, cols: list[str]) -> tuple:
    """Two independent 64-bit xxhash64 digests of a row (128-bit key).

    ``xxhash64`` skips NULL inputs entirely, so ``(1, NULL)`` and
    ``(NULL, 1)`` would hash identically; a null-bitmap of
    ``isNull().cast('int')`` columns is appended to disambiguate.
    The second digest appends a literal salt so the pair acts as one
    128-bit key: at 10^10 distinct rows the collision probability is
    ~3e-19 (birthday bound), an accepted posture for keep-any dedup.
    """
    vals = [F.col(c) for c in cols]
    nullmap = [F.col(c).isNull().cast("int") for c in cols]
    return (
        F.xxhash64(*vals, *nullmap),
        F.xxhash64(*vals, *nullmap, F.lit(0x9E3779B9)),
    )


def dedup_hashed(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D1 keep-any dedup keyed on a 128-bit row digest, for wide rows.

    ``dropDuplicates`` hash-aggregates on all columns — every key
    compare and every exchange partitioner touch the full 16-column
    payload. Here the aggregate groups on two ``xxhash64`` digests
    (16 bytes) and keeps one exemplar row per group via partial-
    aggregatable ``first(struct(*))``: map-side combine collapses
    local duplicates, so the exchange moves one exemplar per
    (digest, input-partition) with a fixed-width key. Survivor
    payloads move once — irreducible for a full-row result — but
    hashing, comparison, and AQE skew stats all run on 16 bytes.

    Measured caveat (sf0.1 lineitem, local[32], best-of-3 noop sink):
    plain ``dropDuplicates()`` wins for narrow-ish rows — 1.0 s vs
    2.1 s here — because ``Deduplicate`` compiles to an EMPTY-buffer
    whole-stage-codegen HashAggregate, while ``first(struct)`` (and
    ``dropDuplicates(subset)``, which desugars to ``first()`` per
    non-key column) falls back to ObjectHashAggregate. Use this form
    when the payload dwarfs the key-compare cost — e.g. document
    tables with multi-KB text, where per-row wide-key hashing and
    skew-stat sampling touch the whole payload;
    ``exact_text_dedup`` (text_dedup.py) is the id-returning variant
    of the same idea. For lineitem-shaped rows, prefer :func:`dedup`.

    Reference parity: data_loader.py:301-311 (``DELETE ... MIN(ctid)
    GROUP BY (t.*)``), keep-any semantics per module docstring.
    """
    cols = subset or df.columns
    h1, h2 = _row_digest(df, cols)
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(h1.alias("__h1"), h2.alias("__h2"))
        .agg(F.first(row).alias("__row"))
        .select("__row.*")
    )


def dup_count(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D2: single-row DataFrame with the number of surplus duplicate rows.

    Computed as ``sum(count_per_group - 1)`` over groups with
    duplicates — one aggregation pass, no second scan, equivalent to
    ``count(*) - count(distinct *)`` but cheaper at scale because the
    partial aggregate combines map-side.

    Scale shape: groups on the 128-bit row digest (see
    :func:`_row_digest`), not the payload columns — the exchange
    carries (16-byte digest, 8-byte partial count) per distinct row
    per partition, so a 16-column lineitem costs the same shuffle
    bytes as a 2-column table.
    """
    cols = subset or df.columns
    h1, h2 = _row_digest(df, cols)
    per_group = df.groupBy(h1.alias("__h1"), h2.alias("__h2")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_group.agg(
        F.coalesce(
            F.sum(F.col("__n") - F.lit(1)), F.lit(0).cast("long")
        ).alias("dup_count")
    )
