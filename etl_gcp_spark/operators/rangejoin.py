"""Binned (bucketed) range join: point-in-interval without a
nested-loop plan.

Spark has no native range-join strategy: ``points JOIN intervals ON
p BETWEEN start AND end`` has no equi-key, so Catalyst falls back to
BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, the
classic 100 TB cliff. The standard fix (Databricks runtime's "range
join optimization", here re-built from open primitives) maps both
sides onto fixed-width bins of the value domain:

- each point lands in exactly one bin (``floor(p / w)``);
- each interval explodes to the bins it overlaps
  (``sequence(floor(start/w), floor((end-1)/w))``);
- bin equality becomes the shuffle/hash key of a plain equi-join,
  and the exact ``start <= p < end`` predicate filters within the
  bucket.

Cost: the interval side inflates by ≈ avg(interval_len)/w + 1 rows,
the join is hash- or sort-merge-based, and every comparison happens
within a bin instead of across the full cross product. Pick ``w`` ≈
median interval length: wider wastes in-bin filtering, narrower
inflates the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``start_col <= point_col < end_col`` (half-open, integer domain).

    Output columns: all of ``points`` then all of ``intervals``.
    The physical plan is an equi-join on the synthetic bin key —
    assert no BroadcastNestedLoopJoin survives (tests do).
    """
    w = F.lit(bin_width)
    p = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.floor((F.col(end_col) - 1) / w),
            )
        ),
    )
    joined = p.join(
        i,
        (p["__bin"] == i["__bin"])
        & (p[point_col] >= i[start_col])
        & (p[point_col] < i[end_col]),
        how,
    )
    return joined.drop("__bin")
