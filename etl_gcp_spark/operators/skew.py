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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 8,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join with salted keys: large side gets a salt in
    [0, salt), small side is exploded once per salt value.

    Cost model: small side inflates ×``salt`` (it must be genuinely
    small or already broadcast-able); the large side's shuffle
    becomes uniform. Columns are preserved as in a plain
    ``large.join(small, key, how)``.

    Salt derivation: pass ``salt_from`` (any stable column that
    varies WITHIN a join key — a row id, a line number) to get a
    DETERMINISTIC salt ``pmod(xxhash64(salt_from), salt)``. The
    default falls back to ``rand(seed)``, which is only
    per-partition-deterministic: a lost executor replays its task
    over the same partition and reproduces the same salts, but any
    upstream repartition re-deals them — harmless for the join
    OUTPUT (the salt is dropped and never changes which rows match),
    yet it makes stage retries produce different shuffle layouts.
    Prefer ``salt_from`` on production pipelines.
    """
    if salt_from is not None:
        salt_expr = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt)).cast(
            "int"
        )
    else:
        salt_expr = (F.rand(seed=42) * salt).cast("int")
    salted_large = large.withColumn("__salt", salt_expr)
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


def key_skew_report(
    df: DataFrame, key: str, *, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnostics BEFORE the expensive shuffle:
    the ``top_n`` heaviest keys with their share of all rows,
    alongside corpus-level skew stats (key count, max/mean ratio,
    4-dp p99 of per-key counts) repeated on each row.

    This is the measurement half of the salting toolkit: a
    ``skew_ratio`` near 1 says hash partitioning will balance; a hot
    key with share ≫ 1/shuffle-partitions names exactly which key
    needs :func:`salted_join`/:func:`salted_count` or AQE skew
    handling. One map-side-combining count per key, then two
    aggregates over the (small) per-key frame — the input data is
    never shuffled, only its key histogram.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 4).alias("mean_cnt"),
        F.round(F.percentile("cnt", F.lit(0.99)), 4).alias("p99_cnt"),
    ).select(
        "n_keys",
        "n_rows",
        "mean_cnt",
        "p99_cnt",
        F.round(F.col("max_cnt") / F.col("mean_cnt"), 4).alias(
            "skew_ratio"
        ),
    )
    # top-k via orderBy+limit → TakeOrderedAndProject (distributed
    # per-partition heaps), NOT a global row_number window — a key
    # histogram can itself be huge at 100 TB. Ranks attach afterwards
    # on the ≤top_n-row result.
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(
        top_n
    )
    # bounded: ≤ top_n rows — the limit(top_n) head above
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = top.withColumn("rank", F.row_number().over(w))
    return top.crossJoin(F.broadcast(stats)).select(
        "rank",
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
        "n_keys",
        "mean_cnt",
        "p99_cnt",
        "skew_ratio",
    )


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight cardinality audit of an equi-join: the EXACT output
    row count (Σ per-key count products) and the ``top_n`` keys that
    contribute the most output — computed from the two key HISTOGRAMS
    only, never materializing the join. The companion to
    :func:`key_skew_report`: that one says whether a shuffle will
    balance; this one says whether the join itself is about to
    explode (the many-to-many fan-out that takes down a cluster run
    long before skew does) and names the keys to pre-aggregate,
    dedup, or salt.

    Cost: two map-side-combined counts + one join of the histograms
    (|distinct keys| rows, tiny next to the data) + one aggregate.
    Output: top keys with (left_cnt, right_cnt, out_rows, out_share
    6 dp) plus the join-total columns repeated on each row.
    """
    lc = left.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("lcnt")
    )
    rc = right.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("rcnt")
    )
    prod = lc.join(rc, "key").select(
        "key", "lcnt", "rcnt", (F.col("lcnt") * F.col("rcnt")).alias("out")
    )
    totals = prod.agg(
        F.sum("out").alias("total_out_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )
    top = prod.orderBy(F.col("out").desc(), F.col("key").asc()).limit(
        top_n
    )
    # bounded: ≤ top_n rows — the limit(top_n) head above
    w = Window.orderBy(F.col("out").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "lcnt",
            "rcnt",
            F.col("out").alias("out_rows"),
            F.round(
                F.col("out") / F.col("total_out_rows").cast("double"), 6
            ).alias("out_share"),
            "total_out_rows",
            "n_join_keys",
        )
    )
