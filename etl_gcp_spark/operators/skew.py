"""Skew mitigation: explicit key salting for pathological joins.

AQE's skew-join handling (on by default in
:mod:`etl_gcp_spark.session`) splits oversized SHUFFLE partitions at
runtime and is the first line of defense. Salting is the explicit
fallback for cases AQE cannot fix — e.g., a single hot key that
dominates a partition even after splitting, or aggregations (AQE skew
handling only covers joins).

``salted_join`` replicates the small side ``salt`` times and
scatters the large side's hot keys uniformly across the replicas:
the hot key's rows land in ``salt`` different partitions instead of
one straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: large side gets a random salt in
    [0, salt), small side is exploded once per salt value.

    Cost model: small side inflates ×``salt`` (it must be genuinely
    small or already broadcast-able); the large side's shuffle
    becomes uniform. Columns are preserved as in a plain
    ``large.join(small, key, how)``.
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return salted_large.join(
        salted_small, [key, "__salt"], how
    ).drop("__salt")


def salted_count(df: DataFrame, key: str, *, salt: int = 8) -> DataFrame:
    """Two-stage skew-safe count per key: pre-aggregate on
    (key, salt), then combine.

    For aggregations AQE offers no skew splitting; salting the
    partial stage bounds any single task's share of a hot key to
    1/``salt``. Works for any algebraic aggregate (sum/count/min/
    max); here: count.
    """
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("n"))
