"""Distribution-drift monitoring: Population Stability Index between
a reference snapshot and a current snapshot.

The corpus-ops counterpart of the validator family: the reference's
validator checks rows against STATIC rules (nulls/ranges/theta,
`data_validator.py:70-118`); PSI instead detects when the DATA ITSELF
has shifted between two snapshots — the signal that retrains models
and re-tunes quality thresholds in a production training-data
pipeline (standard model-monitoring methodology; PSI > 0.2 is the
conventional "significant shift" bar).

Scale posture: everything reduces map-side. Numeric columns bin
against the REFERENCE side's exact decile edges (one percentile
aggregate → a 1-row broadcast; swap in ``approx_percentile`` at
petabyte scale), bin assignment is a codegen ``aggregate`` over the
9-edge array, and each side collapses to ≤ n_bins rows before the
tiny bin-level join. Categorical columns group directly. No row-level
shuffle of either snapshot beyond the binned aggregation.

Replayability: edges round to 4 dp, shares use add-½ (Jeffreys)
smoothing as exact rational arithmetic, PSI terms round to 6 dp —
the DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_DRIFT_BAR = 0.2


def _binned_counts(
    df: DataFrame, col: str, edges: DataFrame
) -> DataFrame:
    """(bin, cnt) for one side: bin = #edges strictly below the value."""
    return (
        df.select(F.col(col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(edges))
        .select(
            F.aggregate(
                "__edges",
                F.lit(0),
                lambda acc, e: acc
                + F.when(F.col("__v") > e, F.lit(1)).otherwise(F.lit(0)),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_numeric(
    ref: DataFrame, cur: DataFrame, col: str, *, n_bins: int = 10
) -> DataFrame:
    """One-row frame: PSI of ``col`` between ``ref`` and ``cur``,
    binned by the reference deciles."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = ref.agg(
        F.array(
            *[F.round(F.percentile(col, F.lit(q)), 4) for q in qs]
        ).alias("__edges")
    )
    spark = ref.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    r = _binned_counts(ref, col, edges).withColumnRenamed(
        "cnt", "ref_cnt"
    )
    c = _binned_counts(cur, col, edges).withColumnRenamed(
        "cnt", "cur_cnt"
    )
    joined = (
        bins.join(r, "bin", "left").join(c, "bin", "left").fillna(0)
    )
    return _psi_from_counts(joined, col)


def _psi_from_counts(joined: DataFrame, col: str) -> DataFrame:
    """(ref_cnt, cur_cnt) bucket frame → one (col_name, psi, drifted)
    row. Totals come from an aggregate re-joined by broadcast — not a
    partition-less window, which would force a single-partition
    WindowExec into the plan (harmless on a ≤bins-row frame, noisy in
    a plan audit)."""
    # add-1/2 smoothing keeps empty buckets finite and the arithmetic
    # exactly replayable (no float eps constant)
    totals = joined.agg(
        F.sum(F.col("ref_cnt") + 0.5).alias("__rt"),
        F.sum(F.col("cur_cnt") + 0.5).alias("__ct"),
    )
    p = (F.col("ref_cnt") + 0.5) / F.col("__rt")
    q = (F.col("cur_cnt") + 0.5) / F.col("__ct")
    return (
        joined.join(F.broadcast(totals))
        .select(F.round((q - p) * F.log(q / p), 6).alias("term"))
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            F.lit(col).alias("col_name"),
            "psi",
            (F.col("psi") > PSI_DRIFT_BAR).alias("drifted"),
        )
    )


def psi_categorical(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """One-row frame: PSI of a categorical column over the union of
    observed categories."""
    r = (
        ref.groupBy(F.col(col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("ref_cnt"))
    )
    c = (
        cur.groupBy(F.col(col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("cur_cnt"))
    )
    joined = r.join(c, "cat", "full").fillna(0)
    return _psi_from_counts(joined, col)


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    *,
    numeric_cols: tuple[str, ...] = (),
    cat_cols: tuple[str, ...] = (),
    n_bins: int = 10,
) -> DataFrame:
    """One row per monitored column: (col_name, psi, drifted).

    Columns are independent single-row aggregates unioned together —
    Spark runs the per-column subtrees as independent stages, so the
    report parallelizes across columns as well as within them.
    """
    parts = [
        psi_numeric(ref, cur, c, n_bins=n_bins) for c in numeric_cols
    ] + [psi_categorical(ref, cur, c) for c in cat_cols]
    if not parts:
        raise ValueError("psi_report needs at least one column")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ks_numeric(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between a reference and
    a current snapshot of an integer-valued column: the max absolute
    gap between the two empirical CDFs — PSI's nonparametric sibling
    (PSI needs bins and smoothing; KS sees ANY distributional change,
    with a distribution-free null).

    Exactness posture: the CDF gap at value v is
    |cumA·nB − cumB·nA| / (nA·nB); the numerator is pure BIGINT
    arithmetic, so the argmax is decided on exact integers and the
    single final division is the only float op — bit-identical in the
    DuckDB oracle. Ties on the max gap break toward the smallest
    value.

    Scale shape: each side collapses to (value, count) map-side
    FIRST, so the ordered cumulative window runs over DISTINCT VALUES
    — bounded by the column's domain, not the row count (for a
    continuous column, quantize/bin before calling; the statistic then
    bounds the binned CDF gap). The single-partition window over the
    domain-sized frame is the deliberate trade; totals join as a
    broadcast single row. Output: 1 row
    (n_ref, n_cur, at_value, ks_stat).
    """
    from pyspark.sql import Window

    a = (
        ref.select(F.col(col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        cur.select(F.col(col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    merged = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    # bounded: ≤ |column domain| rows — both sides collapse to
    # (value, count) first; for continuous columns the caller bins
    # before calling (docstring: the deliberate trade)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = merged.agg(
        F.sum("ca").alias("n_ref"), F.sum("cb").alias("n_cur")
    )
    gap = F.abs(
        F.col("cum_a") * F.col("n_cur") - F.col("cum_b") * F.col("n_ref")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_ref",
            "n_cur",
            F.col("v").alias("at_value"),
            gap.alias("__gap"),
        )
        .orderBy(F.col("__gap").desc(), F.col("at_value"))
        .limit(1)
        .select(
            "n_ref",
            "n_cur",
            "at_value",
            F.round(
                F.col("__gap")
                / (F.col("n_ref") * F.col("n_cur")).cast("double"),
                6,
            ).alias("ks_stat"),
        )
    )
