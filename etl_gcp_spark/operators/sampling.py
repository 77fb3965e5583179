"""Deterministic, engine-portable sampling operators.

The reference has no sampling (its validation reads full tables —
data_validator.py:61-98); at 100 TB, quality metrics and debug
queries need samples. ``df.sample()`` is wrong for that job twice
over: it is nondeterministic across runs/partitionings, and sampling
two tables independently breaks joins (a 10% sample of orders joined
to a 10% sample of lineitem keeps ~1% of join rows, biased to
nothing).

Both operators here key the keep/drop decision on a DETERMINISTIC
hash of a column, not an RNG:

- repeatable: same rows survive on every run, any partitioning, any
  engine — a DuckDB oracle can replay the exact sample;
- universe sampling (VerdictDB/BlinkDB lineage): sampling BOTH join
  sides by the same hash of the JOIN KEY keeps a coherent p-fraction
  of the key universe, so sample(A) ⋈ sample(B) IS a p-sample of
  A ⋈ B (every surviving key keeps all its rows on both sides) —
  aggregate estimates scale by 1/p with no join-selectivity bias.

The hash is a Lehmer/Park–Miller step, h(k) = (k·48271) mod
(2³¹−1), chosen over xxhash64 deliberately: it is exact int64
arithmetic both engines evaluate identically (safe for keys up to
~1.9×10¹⁴ — beyond that, pre-reduce the key mod 2³¹−1), stays
inside whole-stage codegen, and the filter is sargable enough to
evaluate at scan time right after the parquet row-group read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M31 = 2_147_483_647  # 2^31 - 1, Mersenne prime
_A = 48_271  # Park–Miller multiplier


def hash_bucket(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key."""
    return ((key.cast("bigint") * F.lit(_A)) % F.lit(_M31)) % F.lit(buckets)


def universe_sample(
    df: DataFrame, key_col: str, fraction: float, *, buckets: int = 10_000
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of
    bucket space. Same (key_col value ⇒ kept?) decision everywhere:
    apply to both sides of a join on that key and the joined sample
    is a ``fraction`` sample of the join."""
    return df.filter(
        hash_bucket(F.col(key_col), buckets) < int(round(fraction * buckets))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` made
    repeatable): each stratum keeps its own fraction of the key
    space. Rare strata can be kept at 1.0 while dominant strata are
    thinned — the standard shape for balancing a skewed training
    corpus."""
    thresh = F.lit(int(round(default * buckets)))
    for value, frac in sorted(fractions.items()):
        thresh = (
            F.when(F.col(strata_col) == value, int(round(frac * buckets)))
            .otherwise(thresh)
        )
    return df.filter(hash_bucket(F.col(key_col), buckets) < thresh)


def sampled_join_revenue(
    orders: DataFrame, lineitem: DataFrame, *, fraction: float = 0.1
) -> DataFrame:
    """Estimated revenue per order-priority from a universe sample.

    Both tables are sampled by the SAME hash of the order key, so the
    join loses no surviving order's lineitems; per-group revenue and
    row counts scale by 1/fraction. Output carries the estimate next
    to the surviving raw sums so the oracle can check both.
    """
    o = universe_sample(orders, "o_orderkey", fraction).select(
        "o_orderkey", "o_orderpriority"
    )
    l = universe_sample(lineitem, "l_orderkey", fraction).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("sample_rows"),
            F.round(F.sum("rev"), 4).alias("sample_revenue"),
            F.round(F.sum("rev") / fraction, 2).alias("est_revenue"),
        )
    )


def train_test_split(
    df: DataFrame,
    key_col: str,
    *,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/test assignment by key hash.

    The split column is a pure function of the key: re-runs, engine
    changes, and incremental additions never move a key across the
    boundary (the property RNG splits lose the moment data order or
    partitioning changes — and the one that prevents test-set leakage
    when the corpus is re-ingested). Grouped entities (all rows of
    one key) land on the same side, the requirement when the key is a
    user/document and rows are its events/chunks.
    """
    cut = int(round(test_fraction * buckets))
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key_col), buckets) < cut, "test").otherwise(
            "train"
        ),
    )


def temporal_split(
    df: DataFrame,
    time_col: str,
    *,
    cutoff: str,
    embargo_days: int = 0,
    id_col: str | None = None,
) -> DataFrame:
    """Time-ordered train/test assignment with an EMBARGO gap:
    rows at or before ``cutoff`` train; rows inside the following
    ``embargo_days`` are dropped from both sides; later rows test.
    The leakage guard for anything with temporal autocorrelation —
    a random split lets the model see (nearly) the future, and rows
    adjacent to the boundary leak through label/feature windows that
    straddle it; the embargo removes exactly that shoulder (purged
    splits — de Prado 2018, public methodology). The near-dup
    counterpart is ``leakage_safe_split`` (similarity leakage);
    this one kills temporal leakage.

    Pure codegen row classification — no shuffle, no window; the
    cutoff comparison pushes to the scan when ``time_col`` is a
    partition or sort key (date-partitioned tables prune whole
    partitions).

    Output: (id?, time_col, split ∈ {train, embargo, test}).
    Filtering ``split != 'embargo'`` is the caller's choice so the
    dropped count stays auditable.
    """
    t = F.col(time_col)
    cut = F.to_timestamp(F.lit(cutoff))
    emb_end = cut + F.make_dt_interval(F.lit(embargo_days))
    # NULL times classify as embargo (dropped from both sides): the
    # when-chain would otherwise fall through to 'test' — rows with
    # unknown time silently landing in the eval split is exactly the
    # leakage this operator exists to prevent
    split = (
        F.when(t.isNull(), "embargo")
        .when(t <= cut, "train")
        .when(t <= emb_end, "embargo")
        .otherwise("test")
    )
    cols = [F.col(id_col)] if id_col else []
    return df.select(*cols, t.alias(time_col), split.alias("split"))


def kfold_assign(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 5,
    strat_col: str | None = None,
) -> DataFrame:
    """Deterministic k-fold assignment: fold = Lehmer-hash(key) mod k
    — the same exact-arithmetic hash as every sampler here, so folds
    are reproducible across runs, engines, and partitionings, and all
    rows sharing a key land in one fold (grouped CV: a customer's
    orders never straddle folds — the grouped-leakage guard;
    ``temporal_split`` and ``leakage_safe_split`` cover the time and
    similarity axes).

    Pure codegen projection plus, when ``strat_col`` is given, a
    ≤ k·|strata|-row balance summary instead of row output — the
    table one reads to check the folds are stratification-balanced.
    """
    fold = (hash_bucket(F.col(key_col), 10_000) % F.lit(k)).alias("fold")
    if strat_col is None:
        return df.select(F.col(key_col), fold)
    return (
        df.select(fold, F.col(strat_col))
        .groupBy("fold", strat_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("fold", strat_col)
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield–Lund–Thorup, JACM 2007 — public methodology): each row
    gets priority q = w / u with u a deterministic hash-uniform in
    (0, 1]; the sample is the k highest priorities. Against
    independent per-row coin flips this yields a FIXED-SIZE sample
    whose subset-sum estimator max(w, τ) (τ = the (k+1)-th priority)
    is unbiased with near-optimal variance — the right primitive for
    "pick k documents proportionally to quality weight" in a
    training-mix builder.

    Deterministic and replayable: u comes from the same Park–Miller
    LCG hash the sampling family uses (integer arithmetic is exact,
    the two divisions are IEEE-754 exact-rounded, so any engine
    reproduces the ranking bit-for-bit — no ln(), whose libm differs
    across engines, is involved). Rows with a NULL key or a NULL/
    non-positive weight are excluded (a NULL key has no hash-uniform;
    a non-positive weight can never be sampled).

    Distributed shape: the top-(k+1) is one TakeOrderedAndProject
    (per-partition heaps, no global sort); τ and ranks attach on the
    ≤ k+1 surviving rows. Output: (key, weight, est_weight 4 dp,
    rank) for the k kept rows — the raw priority stays internal: at
    q = w/u magnitudes (u can be ~1/2³¹) a 4-dp rounding exceeds
    double precision and engines disagree in the last ULP, while the
    RANKING on the unrounded double is bit-reproducible.
    """
    from pyspark.sql import Window

    u = (
        ((F.col(key_col).cast("bigint") * F.lit(_A)) % F.lit(_M31) + 1)
        / F.lit(float(_M31))
    )
    pri = (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(weight_col).cast("double").alias("weight"),
            (F.col(weight_col).cast("double") / u).alias("__q"),
        )
        .orderBy(F.col("__q").desc(), F.col("key"))
        .limit(k + 1)
    )
    # bounded: ≤ k+1 rows — `pri` is the orderBy+limit(k+1) priority
    # head above (TakeOrderedAndProject), never the population
    w_all = Window.orderBy(F.col("__q").desc(), F.col("key"))
    w_tau = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # τ = the (k+1)-th priority; when the population has ≤ k rows the
    # whole population is kept and DLT defines τ = 0 (est = w exactly)
    return (
        pri.withColumn("rank", F.row_number().over(w_all))
        .withColumn(
            "__tau",
            F.when(
                F.count(F.lit(1)).over(w_tau) > k, F.min("__q").over(w_tau)
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("rank") <= k)
        .select(
            "key",
            "weight",
            F.round(F.greatest(F.col("weight"), F.col("__tau")), 4).alias(
                "est_weight"
            ),
            "rank",
        )
    )


def epoch_shards(
    documents: DataFrame,
    *,
    epoch: int = 0,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle + shard plan — the step between a
    curated corpus and tokenizer/trainer shards: every document gets
    a pseudo-random shuffle key that changes per epoch, a shard
    (key mod ``n_shards``), and a position within its shard. Same
    inputs → the SAME training order on every run, any partitioning,
    any engine; bump ``epoch`` for a fresh permutation.

    The shuffle key is a double-stepped Lehmer hash with a final
    QUADRATIC mix: ``h2 = ((((id+1)·A mod M31) + epoch)·A) mod M31``
    then ``key = (h2² + h2) mod M31``. The quadratic step matters: a
    purely linear map sends every id pair at distance d to keys at
    constant distance d·c mod M31 — ids 94 apart would stay adjacent
    in every epoch's order, a systematic training-order artifact.
    Squaring breaks that linearity while staying exact int64
    arithmetic (h2 < 2³¹ so h2² < 2⁶²) that both the JVM and a SQL
    oracle evaluate identically, per this module's no-RNG
    convention. The quadratic map is not injective — key collisions
    tie-break on id in the within-shard ordering.

    Scale shape: shard assignment is a scan-side projection; the
    within-shard position is a window partitioned BY SHARD — one
    shuffle carrying each row once, ~N/n_shards rows per partition,
    which is exactly the data movement an epoch shuffle semantically
    requires (at the 100-TB materialization this window becomes
    ``write.partitionBy(shard)`` + ``sortWithinPartitions(key)``,
    same movement). NULL ids are excluded (a NULL cannot be ranked
    deterministically), matching the oracle's WHERE.

    Output: (doc_id, shard, pos, shuffle_key).
    """
    from pyspark.sql import Window

    h1 = (F.col(id_col) + 1) * _A % _M31
    h2 = (h1 + F.lit(epoch)) * _A % _M31
    key = (h2 * h2 + h2) % _M31
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        documents.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            (key % n_shards).cast("int").alias("shard"),
            key.cast("long").alias("shuffle_key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos", "shuffle_key")
    )
