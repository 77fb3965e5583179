"""CDC / incremental-maintenance operators.

The reference is a change-data-capture pipeline in name and shape —
its transient chunks are literally ``cdc_chunk_%04d.csv``
(``data_extractor.py:205-217``) and each daily run is a full-refresh
upsert of the warehouse table (``data_loader.py:429-433``,
WRITE_TRUNCATE then WRITE_APPEND). These operators give that flow
engine-level semantics that stay cheap when the table no longer fits a
daily rewrite:

- :func:`cdc_upsert` — keep-latest-per-key merge of a change batch
  into a base snapshot (SCD type 1). One shuffle on the key.
- :func:`scd2_history` — effective-dated history (SCD type 2) from an
  append-only change log, via a single window pass.
- :func:`merge_agg_delta` — incremental maintenance of a grouped
  aggregate: combine a materialized base aggregate with the aggregate
  of a delta batch WITHOUT rescanning base facts. At 100 TB the base
  is never re-read; only the delta shuffles.

Scale notes: upsert shuffles once on the merge key (window over
``partitionBy(keys)``); with the base stored bucketed by the key
(`sinks/writers.py::write_bucketed`) the exchange on the base side
disappears entirely. ``merge_agg_delta`` expresses re-aggregation of
two pre-aggregated inputs — Spark plans a partial/final aggregate over
inputs that are already tiny compared to the facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    *,
    version_col: str = "_src_rank",
    order_by: Sequence = (),
) -> DataFrame:
    """Merge ``changes`` into ``base``, keeping exactly one row per key.

    Two recency models:

    - default: the row with the LOWEST ``version_col`` wins (rank 1 =
      newest batch) — batch-recency merge; the bookkeeping column is
      dropped from the output.
    - ``order_by`` given (Column expressions): the first row under
      that ordering wins — e.g. ``[col('ts').desc()]`` for
      newest-by-event-time, which is the correct model when batches
      are NOT time-ordered (file backfills, out-of-order streams).

    Spark-first MERGE INTO: union the two sides (schema-aligned by
    name), then one ``row_number`` window over the key. A single
    shuffle on ``keys``; no join, no base rewrite of untouched
    partitions at the storage layer when combined with partitioned /
    bucketed sinks. Inserts (keys only in ``changes``) and updates
    (keys in both) fall out of the same pass; ``base``-only keys
    survive untouched.
    """
    unioned = base.unionByName(changes)
    order = list(order_by) if order_by else [F.col(version_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out if order_by else out.drop(version_col)


def scd2_history(
    log: DataFrame,
    keys: Sequence[str],
    *,
    change_time: str,
    version_of: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Effective-dated history (SCD type 2) from an append-only change
    log: each logged state of a key becomes a row with
    ``valid_from``/``valid_to`` bounds and an ``is_current`` flag.

    One window pass — ``lead(change_time)`` over the key ordered by
    time closes each interval; the last state per key stays open
    (``valid_to`` NULL, ``is_current`` true). No self-join: the naive
    formulation (each row joined to its successor) would shuffle the
    log twice and skew on hot keys; ``lead`` is one shuffle, one sort,
    linear scan per partition.

    ``tiebreakers`` make the interval chain deterministic when two
    states of one key share a ``change_time`` — without them the
    lead() order (hence the history) is partitioning-dependent.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(change_time).asc(), *[F.col(t).asc() for t in tiebreakers]
    )
    out = log.select(
        *keys,
        *version_of,
        F.col(change_time).alias("valid_from"),
        F.lead(change_time).over(w).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def merge_agg_delta(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold a delta batch's grouped aggregate into a materialized base
    aggregate without touching base facts.

    ``delta`` is raw fact rows; it is aggregated to the same shape as
    ``base_agg`` (per-key SUMs + row count), then the two aggregates
    are unioned and re-summed. SUM and COUNT are commutative monoids,
    so re-aggregating partial aggregates is exact — the identity Spark
    itself exploits for map-side partial aggregation, lifted to the
    storage layer. The expensive input is never rescanned: cost is
    O(|delta| + |groups|), not O(|base facts|).
    """
    delta_agg = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    return (
        base_agg.unionByName(delta_agg)
        .groupBy(*keys)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).alias(count_col),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff of two table snapshots: row counts per change class
    (added / removed / changed / unchanged) plus, for the changed
    rows, HOW MANY changed in each compared column — the audit a CDC
    apply, backfill, or vendor re-delivery publishes before anyone
    trusts the new snapshot. The companion to :func:`cdc_upsert`:
    that one applies changes, this one quantifies them.

    One full-outer shuffle join on the key (the canonical diff shape —
    co-partitioned/bucketed snapshots make it co-located at scale) and
    one map-side-combining aggregation; comparisons are null-safe
    (`<=>`), all JVM. Output is a long (metric, n) table:
    ``rows:added|removed|changed|unchanged`` then ``col:<name>`` per
    compared column, sorted by metric for stable replay.
    """
    if not compare_cols:
        raise ValueError(
            "snapshot_diff needs at least one compare column "
            "(with none, changed/unchanged is undefined)"
        )
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_n"),
    )
    j = o.join(n, keys, "full_outer")
    ch = [
        (
            (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")))
            & F.col("__in_o").isNotNull()
            & F.col("__in_n").isNotNull()
        )
        .cast("long")
        .alias(f"__ch_{c}")
        for c in compare_cols
    ]
    flagged = j.select("__in_o", "__in_n", *ch)
    any_change = None
    for c in compare_cols:
        flag = F.col(f"__ch_{c}") > 0
        any_change = flag if any_change is None else (any_change | flag)
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    flat = flagged.select(
        status.alias("__st"),
        *[F.col(f"__ch_{c}") for c in compare_cols],
    )
    row = flat.agg(
        *[
            F.sum((F.col("__st") == s).cast("long")).alias(f"rows:{s}")
            for s in ("added", "removed", "changed", "unchanged")
        ],
        *[
            F.sum(f"__ch_{c}").alias(f"col:{c}")
            for c in compare_cols
        ],
    )
    metrics = [f"rows:{s}" for s in ("added", "removed", "changed", "unchanged")]
    metrics += [f"col:{c}" for c in compare_cols]
    stack = ", ".join(f"'{m}', `{m}`" for m in metrics)
    return (
        row.selectExpr(
            f"stack({len(metrics)}, {stack}) AS (metric, n)"
        )
        .select("metric", F.col("n").cast("long").alias("n"))
        .orderBy("metric")
    )


def cdc_merge_with_deletes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    *,
    op_col: str = "op",
    delete_op: str = "D",
    upsert_op: str = "U",
    order_by: Sequence = (),
) -> DataFrame:
    """Delete-aware MERGE — the tombstone half of :func:`cdc_upsert`
    (real CDC feeds carry I/U/D operation codes; an upsert-only merge
    silently resurrects deleted keys on every backfill). The latest
    row per key under ``order_by`` wins exactly as in
    :func:`cdc_upsert`; if the winner's ``op_col`` is ``delete_op``
    the key VANISHES from the snapshot. A later upsert re-inserts the
    key — tombstones mask history at merge time, they don't destroy
    it.

    Sides missing ``op_col`` (e.g. a base snapshot, which is by
    definition live rows) are tagged ``upsert_op``. Same plan shape
    as ``cdc_upsert``: one union, one window shuffle on ``keys``,
    then the tombstone filter — deletes add zero extra exchanges.
    """
    if op_col not in base.columns:
        base = base.withColumn(op_col, F.lit(upsert_op))
    if op_col not in changes.columns:
        changes = changes.withColumn(op_col, F.lit(upsert_op))
    unioned = base.unionByName(changes)
    w = Window.partitionBy(*keys).orderBy(*list(order_by))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )


def golden_record(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """Survivorship merge (MDM "golden record"): collapse every
    entity's event history into one canonical row by explicit,
    deterministic rules — the step after linkage/dedup clusters
    decide WHICH rows are the same entity:

    - ``last_value``: the value of the latest row whose value is
      non-NULL (recency rule; ties on ``ts`` break by ``seq_col``
      descending, so out-of-order feeds resolve identically on every
      run);
    - ``modal_type``: the most frequent type (frequency rule; count
      ties break alphabetically);
    - ``first_seen`` / ``last_seen`` / ``n_events``: exact extremes.

    Physical shape: one ranked window for the recency rule over
    value-bearing rows, one (key, type) count + ranked window for the
    mode, one plain aggregate — all partitioned by the entity key,
    no global window anywhere. Rows with NULL key or NULL ts are
    excluded by convention (they can neither group nor rank).
    """
    base = events.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    recency = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    latest_val = (
        base.filter(F.col(value_col).isNotNull())
        .withColumn("__rn", F.row_number().over(recency))
        .filter(F.col("__rn") == 1)
        .select(F.col(key_col), F.col(value_col).alias("last_value"))
    )
    freq = Window.partitionBy(key_col).orderBy(
        F.col("__cnt").desc(), F.col(type_col).asc()
    )
    modal = (
        base.filter(F.col(type_col).isNotNull())
        .groupBy(key_col, type_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__rk", F.row_number().over(freq))
        .filter(F.col("__rk") == 1)
        .select(F.col(key_col), F.col(type_col).alias("modal_type"))
    )
    spans = base.groupBy(key_col).agg(
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        spans.join(latest_val, key_col, "left")
        .join(modal, key_col, "left")
        .select(
            key_col,
            "last_value",
            "modal_type",
            "first_seen",
            "last_seen",
            "n_events",
        )
    )
