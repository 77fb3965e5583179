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

from pyspark.sql import DataFrame, Window
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


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    z_threshold: float = 3.0,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Statistical outlier gate: rows whose ``value_col`` deviates
    more than ``z_threshold`` standard deviations from their group
    mean (extends the reference's fixed-range rule P12 — hardcoded
    0..100 bounds, data_loader.py:356-359 — to distribution-relative
    bounds that survive schema/scale drift).

    Moments are computed from EXACT decimal sums (Σx, Σx², n) so the
    z-scores are independent of partitioning/summation order — the
    same determinism contract as ``_exact_avg``; a double
    ``stddev_samp`` would wobble in the last ulp across engines and
    partitionings. One grouped pass over the facts; the tiny
    per-group moment table broadcasts back onto the rows, so the
    facts are scanned twice but shuffled never (broadcast join, no
    exchange on the fact side at any scale where groups ≪ rows).
    """
    x = F.col(value_col).cast("decimal(28,8)")
    moments = df.groupBy(*group_cols).agg(
        F.sum(x).alias("__s1"),
        F.sum(x * x).alias("__s2"),
        F.count(x).alias("__n"),
    )
    n = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    keep = id_cols if id_cols is not None else df.columns
    z = (F.col(value_col) - F.col("__mean")) / F.col("__std")
    return (
        df.join(
            F.broadcast(
                moments.select(
                    *group_cols,
                    mean.alias("__mean"),
                    F.sqrt(var).alias("__std"),
                )
            ),
            group_cols,
        )
        .withColumn("zscore", F.round(z, 4))
        .filter(F.abs(F.col("zscore")) > z_threshold)
        .select(*keep, "zscore")
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Deequ-style column profiler: one scan, long-form output.

    For every profiled column: row count, null count, exact distinct
    count, and numeric min/max (NULL for non-numeric columns). All
    metrics are expressions of a SINGLE ``df.agg`` — Catalyst plans
    one hash aggregate over one scan regardless of column count — and
    the wide 1-row result is reshaped to (column, metric rows) with
    ``stack``, which is a zero-shuffle projection.

    At 100 TB swap ``count_distinct`` for ``approx_count_distinct``
    (each exact distinct adds shuffle state per column); the rest is
    map-side-only.
    """
    from pyspark.sql.types import NumericType

    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        mn = f"`__min_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`__max_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(
            f"'{c}', __rows, `__nulls_{c}`, `__nd_{c}`, {mn}, {mx}"
        )
    return wide.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def k_anonymity_suppress(
    df: DataFrame, quasi_cols: list[str], *, k: int = 5
) -> DataFrame:
    """k-anonymity suppression over quasi-identifier columns.

    Any combination of quasi-identifier values shared by fewer than
    ``k`` rows re-identifies individuals; those groups are suppressed
    (dropped) before the data leaves the pipeline — the baseline
    privacy gate for releasing or training on user-derived tables.
    One aggregation computes group sizes; a window would equally work
    but the agg output is tiny (distinct QI combinations), so the
    re-join is a broadcast. Output: surviving rows only.
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gsize"))
    return (
        df.join(F.broadcast(sizes.filter(F.col("__gsize") >= k)), quasi_cols)
        .drop("__gsize")
    )


def l_diversity_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 3,
) -> DataFrame:
    """l-diversity suppression — the privacy gate k-anonymity alone
    misses: a quasi-identifier group can be large (k-anonymous) yet
    have every member sharing ONE sensitive value, so membership in
    the group reveals the attribute (homogeneity attack, Machanavajjhala
    et al. 2007). Groups whose sensitive column carries fewer than
    ``l`` distinct non-NULL values are suppressed.

    Same physical shape as :func:`k_anonymity_suppress`: one
    aggregation over the (tiny) distinct-QI frame — here with an
    exact ``count_distinct`` per group, a shuffle of (QI, sensitive)
    pairs, already deduplicated map-side — then a broadcast re-join
    of the qualifying groups. At 100 TB the distinct-pair frame is
    bounded by |QI combos| × |sensitive domain|, orders of magnitude
    under the data; when the sensitive domain itself explodes,
    swap the exact count for the HLL sketch
    (:mod:`etl_gcp_spark.functions.sketches`) and accept its ±2%.
    Output: surviving rows only, original schema. Rows with NULL in
    any quasi-identifier never match the equi-re-join and are
    therefore suppressed — the same (conservative) convention as
    :func:`k_anonymity_suppress`; NULL sensitive values count zero
    toward diversity.
    """
    diverse = (
        df.groupBy(*quasi_cols)
        .agg(
            F.count_distinct(F.col(sensitive_col)).alias("__ndistinct")
        )
        .filter(F.col("__ndistinct") >= l)
    )
    return df.join(F.broadcast(diverse), quasi_cols).drop("__ndistinct")


# round(log10(1 + 1/d), 6) for d = 1..9, precomputed as literals: the
# expected Benford shares are CONSTANTS, so baking them in keeps log10
# (not correctly rounded in libm) out of both engines entirely.
BENFORD_SHARES = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def benford_check(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of a numeric column vs
    Benford's law — the classic screen for fabricated or truncated
    numeric data (amounts entered by humans, capped sensors, synthetic
    rows injected into a feed all bend the leading-digit curve).

    The leading digit is taken from the integer part's decimal string
    (values in [0, 1) and NULLs are excluded — they have no leading
    digit in Benford's sense); one map-side 9-group aggregation, a
    broadcast single-row total, expected shares joined from a 9-row
    literal map. Every float step is a single correctly-rounded IEEE
    op on exact integer inputs, so the DuckDB oracle replays
    bit-for-bit.

    Output: (digit, n, obs_share, exp_share, abs_dev) — 9 rows; a
    gate thresholds max(abs_dev) or feeds the counts to a chi-square.
    """
    digit = F.substring(
        F.floor(F.abs(F.col(col))).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull() & (F.abs(F.col(col)) >= 1))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    exp_map = F.create_map(
        *[F.lit(x) for kv in BENFORD_SHARES.items() for x in kv]
    )
    obs = F.round(F.col("n") / F.col("__total"), 6)
    exp = F.element_at(exp_map, F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            obs.alias("obs_share"),
            exp.alias("exp_share"),
            F.round(F.abs(obs - exp), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


def boxplot_stats(
    df: DataFrame, col: str, *, group_col: str, k: float = 1.5
) -> DataFrame:
    """Per-group five-number summary + Tukey outlier counts — the
    boxplot table (min, q1, median, q3, max, IQR-fence outliers):
    the at-a-glance distribution audit that profile_table's
    moment-based row can't give (quartiles survive skew and heavy
    tails; the k·IQR fence is the classic robust outlier rule,
    between zscore_outliers' fragile sigma and mad_outliers' heavier
    two-pass MAD).

    ONE array-percentile aggregate per group buffers the column once
    (the five scalar forms would buffer it five times — winsorize's
    measured trap), then a single re-scan counts fence violations
    against the broadcast quartile table. Quartiles round to 4 dp;
    fences are arithmetic on the rounded values — replayable.
    """
    q = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.percentile(
            col,
            F.array(
                F.lit(0.0), F.lit(0.25), F.lit(0.5),
                F.lit(0.75), F.lit(1.0),
            ),
        ).alias("__q"),
        F.count(F.lit(1)).alias("n"),
    )
    stats = q.select(
        "grp",
        "n",
        F.round(F.element_at("__q", 1), 4).alias("min_v"),
        F.round(F.element_at("__q", 2), 4).alias("q1"),
        F.round(F.element_at("__q", 3), 4).alias("median"),
        F.round(F.element_at("__q", 4), 4).alias("q3"),
        F.round(F.element_at("__q", 5), 4).alias("max_v"),
    )
    lo = F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))
    out = (
        df.select(F.col(group_col).alias("grp"), F.col(col).alias("__v"))
        .join(F.broadcast(stats), "grp")
        .groupBy("grp", "n", "min_v", "q1", "median", "q3", "max_v")
        .agg(
            F.sum(
                ((F.col("__v") < lo) | (F.col("__v") > hi)).cast("long")
            ).alias("n_outliers")
        )
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n", "min_v", "q1", "median", "q3", "max_v", "n_outliers",
    ).orderBy(group_col)


def numeric_corr_matrix(
    df: DataFrame, columns: list[str], *, scale: int = 2
) -> DataFrame:
    """Pearson correlation matrix over numeric columns in ONE
    aggregation pass — the data-profiling step that finds redundant
    or leaking features before training.

    Replay discipline: each value is fixed-pointed to ``scale`` dp
    (exact for money/quantity columns stored at 2 dp) as an int64;
    Σx stays int64-exact, Σx² and Σxy accumulate as DECIMAL(38,0)
    (order-free exact integer sums — a double accumulator would be
    partition-order dependent). The textbook formula
    n·Σxy − Σx·Σy over sqrt(n·Σx² − (Σx)²)·sqrt(n·Σy² − (Σy)²)
    is then a FIXED tree of correctly-rounded double ops (cast, ×,
    −, sqrt, ÷) on exact aggregates, rounded once to 6 dp —
    bit-identical across engines. NULL-free rows only (listwise
    deletion, the standard corr contract).

    Scale: one full scan with map-side combine into
    2k + k(k+1)/2 + 1 counters; output k(k−1)/2 rows. No shuffle of
    data rows at all — only the counter row moves.
    """
    nn = df
    for c in columns:
        nn = nn.filter(F.col(c).isNotNull())
    ints = nn.select(
        *[
            (F.col(c).cast(f"decimal(18,{scale})") * (10 ** scale))
            .cast("long")
            .alias(c)
            for c in columns
        ]
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
    for i, a in enumerate(columns):
        for b in columns[i:]:
            aggs.append(
                F.sum(
                    (F.col(a) * F.col(b)).cast("decimal(38,0)")
                ).alias(f"p_{a}__{b}")
            )
    stats = ints.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("__n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxy = F.col(f"p_{a}__{b}").cast("double")
        sxx = F.col(f"p_{a}__{a}").cast("double")
        syy = F.col(f"p_{b}__{b}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        # constant column → zero variance → corr undefined: NULL
        # explicitly (engines disagree on double x/0)
        return F.when(den > 0, F.round(num / den, 6))

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                corr(a, b).alias("corr"),
                F.col("__n").alias("n_rows"),
            )
            for i, a in enumerate(columns)
            for b in columns[i + 1 :]
        ]
    )
    return stats.select(F.explode(pairs).alias("r")).select("r.*")


def analyze_table_stats(
    df: DataFrame, columns: list[str], *, registers: DataFrame | None = None
) -> DataFrame:
    """ANALYZE-style per-column statistics — the stats table a
    cost-based optimizer feeds on (row count, null count, min/max,
    NDV): the catalog-side complement to the CMS join-size estimator
    in functions/sketches.py.

    ONE scan: the columns unpivot into a (column, val) long frame via
    an exploded struct array, so row count / null count / min / max
    for every column come from a single map-side-combined
    aggregation. NDV is the HLL register sketch from
    functions/sketches.py over the same long frame (≤ cols·128
    register rows ever shuffle — COUNT(DISTINCT) per column would be
    |cols| full shuffles of the data, exactly what stats collection
    at 100 TB cannot afford). NULLs are excluded from NDV (the CBO
    convention; the null count is its own column).

    Values are cast to double for a uniform long frame — exact for
    integer keys < 2^53 and 2-dp measures, the columns a planner
    actually keys on.

    Returns (col_name, n_rows, n_nulls, ndv_est, n_registers_used,
    min_val, max_val). Callers that need the register table itself
    (e.g. for an oracle replay) rebuild it from
    :func:`stats_long_frame` + ``hll_registers`` — identical rows.
    """
    long_frame = stats_long_frame(df, columns)
    exact = long_frame.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("val").isNull(), 1).otherwise(0)
        ).alias("n_nulls"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    from etl_gcp_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    # callers that already materialized the (grp, idx, rho) registers
    # (e.g. to side-write them for an oracle replay) pass them in and
    # skip the second register scan
    regs = (
        registers
        if registers is not None
        else hll_registers(
            long_frame.filter(F.col("val").isNotNull()),
            "val",
            "col_name",
        )
    )
    est = hll_estimate(regs).select(
        F.col("grp").alias("col_name"),
        F.col("est_distinct").alias("ndv_est"),
        "n_registers_used",
    )
    return exact.join(F.broadcast(est), "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "ndv_est",
        "n_registers_used",
        "min_val",
        "max_val",
    )


def stats_long_frame(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_name, val) unpivot of the given columns, vals as double —
    one scan feeds every per-column statistic."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("double").alias("val"),
            )
            for c in columns
        ]
    )
    return df.select(F.explode(entries).alias("e")).select("e.*")


def fd_violation_report(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Functional-dependency audit: does ``lhs → rhs`` hold? Reports
    how many lhs keys map to more than one distinct rhs value — the
    profiling check behind key discovery, denormalization safety, and
    "is this column derivable" questions (Papenbrock et al. 2015's
    FD-discovery primitive for a single candidate).

    One groupBy(lhs) with count_distinct(rhs), then a 1-row summary:
    exact integer counts, one IEEE division for the rate. NULL lhs
    keys are excluded (a NULL key identifies nothing); NULL rhs
    values are ignored by count_distinct on both engines, so a key
    whose only rhs is NULL has nd = 0 and never counts as violating.

    Scale: the shuffle is keyed by lhs (the candidate key — high
    cardinality means near-unique groups, cheap combine); the summary
    aggregation runs on the per-key frame, never re-scanning facts.

    Output (1 row): n_keys, n_violating, violation_rate,
    max_rhs_per_key.
    """
    per_key = (
        df.filter(F.col(lhs).isNotNull())
        .groupBy(lhs)
        .agg(F.count_distinct(F.col(rhs)).alias("__nd"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0)).alias(
            "n_violating"
        ),
        F.round(
            F.sum(
                F.when(F.col("__nd") > 1, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("violation_rate"),
        F.max("__nd").alias("max_rhs_per_key"),
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    *,
    n_buckets: int = 16,
) -> DataFrame:
    """Equi-depth (equal-height) histogram — the range-selectivity
    statistic every cost-based optimizer keeps beside NDV
    (:func:`analyze_table_stats`): ``n_buckets`` buckets of equal row
    count with their value bounds.

    bucket = (rank−1)·n_buckets div n — pure integer arithmetic on a
    deterministic global rank (``tiebreak_cols`` must complete a
    strict total order, so the rank — and therefore every bucket —
    is identical on every engine and partitioning; range-partition
    boundaries only decide WHERE a rank is computed, never its
    value). The rank itself is the textbook distributed two-pass:
    ``repartitionByRange`` on the sort key, per-partition
    ``row_number`` (windows keyed by partition id — parallel, never
    a single-partition global window), plus broadcast cumulative
    partition offsets. One range exchange total — the shuffle
    equi-depth fundamentally needs (it IS how warehouse ANALYZE
    builds height-balanced histograms; at 100 TB it runs on a
    sample, which changes this plan not at all).

    Output: (bucket, lo, hi, n_rows).
    """
    order = [F.col(value_col)] + [F.col(c) for c in tiebreak_cols]
    rows = df.filter(F.col(value_col).isNotNull())
    n = rows.count()
    n_parts = max(1, min(32, n // 65536 + 1))
    parts = rows.repartitionByRange(n_parts, *order).select(
        F.col(value_col).alias("__v"),
        *[F.col(c) for c in tiebreak_cols],
        F.spark_partition_id().alias("__pid"),
    )
    counts = parts.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # bounded: ≤ n_parts count rows (one per spark partition id) —
    # tiny by construction, this single-partition window never sees
    # data-scaled input
    off_w = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias(
            "__off"
        ),
    )
    in_part = Window.partitionBy("__pid").orderBy(
        F.col("__v"), *[F.col(c) for c in tiebreak_cols]
    )
    ranked = (
        parts.withColumn("__rn_in", F.row_number().over(in_part))
        .join(F.broadcast(offsets), "__pid")
        .select(
            "__v",
            (F.col("__off") + F.col("__rn_in")).alias("__rn"),
        )
    )
    return (
        ranked.select(
            F.expr(f"((__rn - 1) * {n_buckets}) div {n}")
            .cast("int")
            .alias("bucket"),
            "__v",
        )
        .groupBy("bucket")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def range_selectivity_report(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    *,
    lo: float,
    hi: float,
    n_buckets: int = 16,
) -> DataFrame:
    """Selectivity audit: estimate ``COUNT(lo ≤ x ≤ hi)`` from the
    equi-depth histogram (uniform interpolation inside partially
    overlapped buckets — the textbook CBO formula) and report it
    against the exact count. With :func:`analyze_table_stats` (NDV)
    and ``cms_join_size`` (join cardinality) this completes the
    planner's estimation toolkit: scan selectivity × NDV × join size
    is what picks broadcast vs shuffle vs salting at 100 TB.

    Determinism: each bucket's contribution is a fixed double tree
    (one width division, one multiply) rounded to 6 dp, and the
    cross-bucket total accumulates as DECIMAL(18,6) — float summation
    order is partition-dependent, decimal summation is exact — so
    the estimate replays bit-for-bit.

    Output (1 row): est_rows, true_rows, rel_error.
    """
    hist = equi_depth_histogram(
        df, value_col, tiebreak_cols, n_buckets=n_buckets
    )
    plo, phi = F.lit(float(lo)), F.lit(float(hi))
    blo = F.col("lo").cast("double")
    bhi = F.col("hi").cast("double")
    overlap = F.greatest(
        F.lit(0.0),
        F.least(phi, bhi) - F.greatest(plo, blo),
    )
    frac = F.when(
        bhi > blo, overlap / (bhi - blo)
    ).otherwise(
        # degenerate bucket (single value): in or out, never partial
        F.when((blo >= plo) & (blo <= phi), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
    )
    contrib = F.round(F.col("n_rows").cast("double") * frac, 6)
    est = hist.agg(
        F.sum(contrib.cast("decimal(18,6)"))
        .cast("double")
        .alias("est_rows")
    )
    true_rows = df.filter(
        F.col(value_col).isNotNull()
        & (F.col(value_col) >= plo)
        & (F.col(value_col) <= phi)
    ).agg(F.count(F.lit(1)).alias("true_rows"))
    return est.crossJoin(true_rows).select(
        "est_rows",
        "true_rows",
        F.round(
            F.abs(
                F.col("est_rows") - F.col("true_rows").cast("double")
            )
            / F.col("true_rows").cast("double"),
            6,
        ).alias("rel_error"),
    )
