"""Count-min sketch: sublinear-memory frequency estimation
(Cormode & Muthukrishnan 2005) for heavy-hitter / frequency queries
over key domains too large to count exactly.

``key_skew_report`` (operators/skew.py) is the EXACT heavy-hitter
path — right whenever the distinct-key count fits a shuffle. The CMS
is the posture for when it does not: the sketch is ``depth × width``
counters REGARDLESS of domain size (here 4×256 = 8 KB), built in one
map-side-combined aggregation and mergeable across partitions/days by
plain counter addition — the property that makes it a streaming/
pre-aggregation primitive.

Engine-portable hashing: universal hashes
``((a·(x mod p) + b) mod p) mod width`` with p = 2^31 − 1, so every
intermediate fits int64 EXACTLY in both the JVM and DuckDB (no
wrap-around semantics in play — DuckDB raises on bigint overflow
where the JVM wraps silently, so staying under 2^62 is what makes the
sketch replayable in the SQL oracle). xxhash64 would be cheaper but
exists in only one engine.

Estimates are biased UP (point query returns the min over d
counters, each inflated only by collisions) — the classic CMS
guarantee est ≥ true, est ≤ true + εN w.h.p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_gcp_spark.smalldf import small_df

CMS_PRIME = 2147483647  # 2^31 - 1 (Mersenne)
# fixed (a, b) per hash row — any 1 ≤ a < p, 0 ≤ b < p gives a
# universal family member; literals so both engines replay them
CMS_SEEDS = ((1103515245, 12345), (976369, 17), (105943, 29), (611953, 7919))


def _bucket(key_col, a: int, b: int, width: int):
    p = F.lit(CMS_PRIME)
    return (
        (F.lit(a) * (key_col.cast("long") % p) + F.lit(b)) % p
    ) % F.lit(width)


def cms_build(
    df: DataFrame, key: str, *, width: int = 256
) -> DataFrame:
    """(row, bucket, cnt) counters — ≤ depth·width rows total."""
    hashes = F.array(
        *[
            _bucket(F.col(key), a, b, width)
            for a, b in CMS_SEEDS
        ]
    )
    return (
        df.select(F.posexplode(hashes).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_queries(
    df: DataFrame,
    key: str,
    query_keys: list[int],
    *,
    width: int = 256,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Estimate vs truth for a fixed key list. Output:
    (key, est_count, true_count) — est ≥ true always.

    The sketch side joins on (row, bucket) — ≤ depth·|queries| probe
    rows against ≤ depth·width counters, both broadcastable at any
    data scale; the exact side is a filtered aggregation over only
    the queried keys (predicate pushed to the scan). Pass ``sketch``
    to probe a prebuilt/merged counter table (e.g. one accumulated
    across streaming microbatches) instead of building from ``df``.
    """
    spark = df.sparkSession
    q = small_df(spark, [(int(k),) for k in query_keys], "key long")
    hashes = F.array(
        *[_bucket(F.col("key"), a, b, width) for a, b in CMS_SEEDS]
    )
    probes = q.select(
        "key", F.posexplode(hashes).alias("row", "bucket")
    )
    if sketch is None:
        sketch = cms_build(df, key, width=width)
    est = (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
    true = (
        df.filter(F.col(key).isin([int(k) for k in query_keys]))
        .groupBy(F.col(key).cast("long").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        est.join(true, "key", "left")
        .select(
            "key",
            "est_count",
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
        )
        .orderBy("key")
    )


# ------------------------------------------------------------------ HLL
# Replayable HyperLogLog (Flajolet et al. 2007, public methodology):
# unlike the DataSketches-backed hll_sketch_agg entry (whose serialized
# estimator is engine-specific), these registers are plain rows any
# engine can re-aggregate — the verifiable twin of the black-box sketch.

HLL_P = 7                      # 2^7 = 128 registers per group
HLL_M = 1 << HLL_P
# alpha_128 = 0.7213 / (1 + 1.079/128) — both engines derive the same
# double from these literals
HLL_ALPHA_NUM = 0.7213
HLL_ALPHA_DEN = 1.0 + 1.079 / 128.0


def hll_registers(
    df: DataFrame, key: str, group: str
) -> DataFrame:
    """Per-row HLL register observations: (group, idx, rho).

    idx = low p bits of xxhash64(key); rho = 1 + leading-zero count of
    the remaining 57 bits, computed as 58 − bit_length via
    ``length(bin(rest))`` — bin() drops leading zeros, so its string
    length IS the bit length: one integer + one cheap string op per
    row, no libm log whose last-ULP behavior varies across platforms
    (an earlier lpad+regexp formulation computed the identical rho at
    ~2.5× the scan cost). One row per input row; groupBy(group, idx)
    .max(rho) IS the sketch — mergeable across partitions, batches,
    and days by construction (max is associative), which is the whole
    point of HLL at 100 TB: per-executor partial registers combine
    map-side, and only m=128 rows per group ever shuffle.

    NULL keys all hash to xxhash64's seed value, so they collectively
    register as ONE distinct — unlike COUNT(DISTINCT key), which
    excludes NULLs entirely; filter NULLs upstream if that contract
    is required.
    """
    h = F.xxhash64(F.col(key))
    rest = F.shiftrightunsigned(h, HLL_P)
    # leading zeros in the (64-P)-bit field = (64-P) - bit_length;
    # rest == 0 (bin -> "0", length 1) is the one special case
    rho = F.when(
        rest == 0, F.lit(64 - HLL_P + 1)
    ).otherwise(F.lit(64 - HLL_P + 1) - F.length(F.bin(rest)))
    return df.select(
        F.col(group).alias("grp"),
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
        rho.cast("long").alias("rho"),
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Harmonic-mean HLL estimate per group from (grp, idx, rho) rows.

    est = alpha * m^2 / (sum over all m registers of 2^-M_j), with
    empty registers contributing 2^0 = 1, plus the paper's standard
    small-range correction: when raw_est <= 2.5m and empty registers
    remain, linear counting m * ln(m/V) takes over (V = empty-register
    count). Every 2^-M_j is an exact power of two; the engine-
    sensitive steps (sum association order, libm ln) only move the
    last ULP of a VALUE, which the repo-wide 4-dp rounding absorbs —
    same convention the zipf_fit oracle already relies on (ln is safe
    in rounded values, never in rankings).
    """
    regs = registers.groupBy("grp", "idx").agg(F.max("rho").alias("mx"))
    v = (F.lit(HLL_M) - F.col("__n_nonempty")).cast("double")
    raw = (
        F.lit(HLL_ALPHA_NUM / HLL_ALPHA_DEN)
        * F.lit(float(HLL_M) * float(HLL_M))
        / (F.col("__s_nonempty") + v)
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    return (
        regs.groupBy("grp")
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("__s_nonempty"),
            F.count(F.lit(1)).alias("__n_nonempty"),
        )
        .select(
            "grp",
            F.round(est, 4).alias("est_distinct"),
            F.col("__n_nonempty").cast("long").alias("n_registers_used"),
        )
    )


def hll_overlap(
    df: DataFrame,
    key: str,
    part_col: str,
    part_a: str,
    part_b: str,
) -> DataFrame:
    """Distinct-overlap estimate between two partitions of a table via
    HLL inclusion–exclusion: est(A∩B) = est(A) + est(B) − est(A∪B),
    where the union sketch is just the register-wise MAX of the two
    sides — the property that answers "how many distinct documents do
    these two crawls share?" at 100 TB with three 128-row sketches
    instead of an exact distinct join. Output: one row
    (est_a, est_b, est_union, est_intersection), all 4 dp.
    """
    a = hll_registers(
        df.filter(F.col(part_col) == part_a), key, part_col
    ).select(F.lit("a").alias("grp"), "idx", "rho")
    b = hll_registers(
        df.filter(F.col(part_col) == part_b), key, part_col
    ).select(F.lit("b").alias("grp"), "idx", "rho")
    both = a.unionByName(b)
    union_regs = both.select(F.lit("u").alias("grp"), "idx", "rho")
    ests = hll_estimate(both.unionByName(union_regs))
    wide = ests.groupBy().pivot("grp", ["a", "b", "u"]).sum("est_distinct")
    return wide.select(
        F.round(F.col("a"), 4).alias("est_a"),
        F.round(F.col("b"), 4).alias("est_b"),
        F.round(F.col("u"), 4).alias("est_union"),
        F.round(F.col("a") + F.col("b") - F.col("u"), 4).alias(
            "est_intersection"
        ),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    *,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Mergeable fixed-grid histogram quantile sketch — the missing
    quarter of the sketch family (CMS counts, HLL cardinality, top-k
    heavy hitters, and now quantiles): one scan builds per-partition
    bin counts that merge by addition, so the shuffle carries
    ≤ ``n_bins`` rows regardless of data size — the practical
    single-pass distributed quantile at 100 TB, where an exact
    sort-based percentile is a full-data exchange.

    Grid: [min, max] split into ``n_bins`` equal bins (two exact
    extremes from the same scan); bin index is
    ``floor((x − min)/(max − min) · n_bins)`` clamped to the last
    bin. The quantile estimate walks the cumulative histogram to the
    target rank ``ceil(q·N)`` and interpolates linearly inside the
    landing bin. Every step is exact integer counting plus a fixed
    IEEE expression tree, so the estimate — unlike ``approxQuantile``
    (a GK sketch no other engine reproduces) — replays bit-for-bit
    in the DuckDB oracle. Error is bounded by one bin width,
    (max−min)/n_bins. NULL values are excluded; a degenerate column
    (min = max) returns that value for every quantile.

    Output: (q, est, n_values) — one row per requested quantile.
    """
    from pyspark.sql import Window

    vals = df.select(F.col(value_col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    ext = vals.agg(
        F.min("__x").alias("__lo"),
        F.max("__x").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    binned = (
        vals.crossJoin(F.broadcast(ext))
        .select(
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col("__x") - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * F.lit(float(n_bins))
                    ).cast("int"),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # bounded: ≤ n_bins rows — the fixed-width histogram compaction
    # above (clamped edges), never the value stream
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).crossJoin(F.broadcast(ext))
    qdf = small_df(
        vals.sparkSession, [(float(q),) for q in qs], "q double"
    )
    # target rank; the landing bin is the first with cum >= target
    t = F.ceil(F.col("q") * F.col("__n")).cast("long")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("__t", t)
        .filter(F.col("cum") >= F.col("__t"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy("bin")
            ),
        )
        .filter(F.col("__rn") == 1)
    )
    frac = (
        F.col("__t") - (F.col("cum") - F.col("cnt"))
    ).cast("double") / F.col("cnt").cast("double")
    est = F.when(F.col("__hi") == F.col("__lo"), F.col("__lo")).otherwise(
        F.col("__lo")
        + (F.col("bin").cast("double") + frac)
        * ((F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins)))
    )
    return hit.select(
        "q",
        F.round(est, 6).alias("est"),
        F.col("__n").alias("n_values"),
    )


def histogram_bins(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """FIXED-GRID histogram partial: per-bin counts over a known
    [lo, hi] domain — the mergeable building block behind
    :func:`streaming histogram quantiles <quantiles_from_bins>`.

    :func:`histogram_quantiles` derives its grid from the data's own
    min/max, which needs a completed scan — fine for batch,
    impossible mid-stream. The streaming discipline is the standard
    one: fix the grid up front from domain knowledge (a price cap, a
    latency budget); values outside clamp into the edge bins, and the
    partials merge by per-bin ADDITION, so every micro-batch /
    executor / day-partition can sketch independently. NULLs are
    excluded. Output: (bin, cnt) — at most ``n_bins`` rows.
    """
    if not hi > lo:
        raise ValueError("need hi > lo for a fixed histogram grid")
    x = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (x - F.lit(float(lo)))
                / (F.lit(float(hi)) - F.lit(float(lo)))
                * F.lit(float(n_bins))
            ).cast("int"),
        ),
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantiles_from_bins(
    bins: DataFrame,
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Quantile estimates from (possibly pre-merged) fixed-grid
    histogram partials: sums per-bin counts, walks the cumulative
    histogram to rank ceil(q·N), interpolates inside the landing bin
    — the identical exact-integer + fixed-IEEE-tree walk as
    :func:`histogram_quantiles`, so a SQL oracle replays it
    bit-for-bit. Error ≤ one bin width for in-domain data (clamped
    outliers pin to the edge bins). Output: (q, est, n_values).
    """
    from pyspark.sql import Window

    merged = bins.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    ext = merged.agg(F.sum("cnt").alias("__n"))
    # bounded: ≤ n_bins rows — merged pre-binned counts, never the
    # underlying values
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.select(
        "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(ext))
    qdf = small_df(
        bins.sparkSession, [(float(q),) for q in qs], "q double"
    )
    t = F.ceil(F.col("q") * F.col("__n")).cast("long")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("__t", t)
        .filter(F.col("cum") >= F.col("__t"))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("q").orderBy("bin")),
        )
        .filter(F.col("__rn") == 1)
    )
    frac = (
        F.col("__t") - (F.col("cum") - F.col("cnt"))
    ).cast("double") / F.col("cnt").cast("double")
    est = F.lit(float(lo)) + (F.col("bin").cast("double") + frac) * (
        (F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(n_bins))
    )
    return hit.select(
        "q",
        F.round(est, 6).alias("est"),
        F.col("__n").alias("n_values"),
    )


def grouped_histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-GROUP fixed-grid histogram quantiles — the grouped form of
    the sketch family's quantile leg: one scan builds (group, bin)
    counts (≤ groups × n_bins rows ever shuffle, regardless of data
    size), then each group's cumulative histogram is walked to rank
    ceil(q·N_g) with linear interpolation in the landing bin. The
    shape that replaces per-group exact percentiles (a full sort
    within every group) at 100 TB; same exact-integer + fixed-IEEE
    walk as :func:`histogram_quantiles`, so a SQL oracle replays the
    estimates bit-for-bit. Error ≤ one bin width; NULL values and
    NULL groups are excluded. Output: (grp, q, est, n_values).
    """
    from pyspark.sql import Window

    if not hi > lo:
        raise ValueError("need hi > lo for a fixed histogram grid")
    x = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (x - F.lit(float(lo)))
                / (F.lit(float(hi)) - F.lit(float(lo)))
                * F.lit(float(n_bins))
            ).cast("int"),
        ),
    )
    binned = (
        df.filter(x.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ext = binned.groupBy("grp").agg(F.sum("cnt").alias("__n"))
    w = Window.partitionBy("grp").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "grp", "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    ).join(F.broadcast(ext), "grp")
    qdf = small_df(
        df.sparkSession, [(float(q),) for q in qs], "q double"
    )
    t = F.ceil(F.col("q") * F.col("__n")).cast("long")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("__t", t)
        .filter(F.col("cum") >= F.col("__t"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("grp", "q").orderBy("bin")
            ),
        )
        .filter(F.col("__rn") == 1)
    )
    frac = (
        F.col("__t") - (F.col("cum") - F.col("cnt"))
    ).cast("double") / F.col("cnt").cast("double")
    est = F.lit(float(lo)) + (F.col("bin").cast("double") + frac) * (
        (F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(n_bins))
    )
    return hit.select(
        "grp",
        "q",
        F.round(est, 6).alias("est"),
        F.col("__n").alias("n_values"),
    )


# --------------------------------------------------- join-size estimate
# CMS inner product (the AGMS/CM "dot product of frequency vectors"
# estimator, Cormode & Muthukrishnan 2005 §4.2): |A ⋈_k B| equals the
# inner product of the two key-frequency vectors, and the sketch
# estimate min_d Σ_b cntA[d,b]·cntB[d,b] upper-bounds it with error
# ≤ ε·|A|·|B| w.h.p.  This is what a cost-based planner does BEFORE
# choosing a join strategy: two 8 KB counter tables (built map-side,
# mergeable across partitions/days by addition) answer "will this
# join explode / should the small side broadcast / does this key need
# salting" without shuffling either table — at 100 TB the estimate
# costs two scans and ~zero network, where the join it sizes costs a
# full shuffle of both sides.  join_explosion_report (operators/
# skew.py) is the EXACT top-k version of the same question; this is
# the sublinear posture for domains too large to count exactly.


def cms_join_size(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    *,
    width: int = 256,
) -> DataFrame:
    """1-row report: (est_rows, true_rows, over_ratio).

    est_rows = min over the 4 hash rows of the bucket-wise counter
    dot product — always ≥ true_rows (collisions only ADD mass).
    true_rows is computed from per-key counts (Σ cntA(k)·cntB(k) over
    matching keys — an aggregation, never the join itself).  NULL
    keys are excluded on both paths (an equi-join never matches
    NULL).  Same engine-portable universal hashes as cms_build, so
    the DuckDB oracle replays counters, dot products, and the final
    IEEE division bit-for-bit.
    """
    a_nn = a.filter(F.col(a_key).isNotNull())
    b_nn = b.filter(F.col(b_key).isNotNull())
    sa = cms_build(a_nn, a_key, width=width)
    sb = (
        cms_build(b_nn, b_key, width=width)
        .withColumnRenamed("cnt", "cnt_b")
    )
    est = (
        sa.join(sb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("v"))
        # disjoint sketches produce an empty dot product: estimate 0
        .agg(F.coalesce(F.min("v"), F.lit(0)).alias("est_rows"))
    )
    ka = a_nn.groupBy(F.col(a_key).alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    kb = b_nn.groupBy(F.col(b_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    truth = ka.join(kb, "k").agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias(
            "true_rows"
        )
    )
    return est.crossJoin(truth).select(
        "est_rows",
        "true_rows",
        F.when(
            F.col("true_rows") > 0,
            F.col("est_rows").cast("double")
            / F.col("true_rows").cast("double"),
        ).alias("over_ratio"),
    )
