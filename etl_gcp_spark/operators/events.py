"""Event-stream batch operators: JSON, time windows, sessions, as-of.

The reference has no streaming/temporal operators (SURVEY.md §2.9);
these cover the `events` table surface the engine needs: JSON
extraction, tumbling-window aggregation, gap-based sessionization, and
an as-of join (point-in-time lookup) — the classic operator Spark has
no primitive for, composed here from built-ins (SURVEY.md §4.3
preference order (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_props_key(events: DataFrame, key: str = "k") -> DataFrame:
    """Pull an integer key out of the JSON ``props`` column.

    ``get_json_object`` runs JVM-side (no UDF); at scale prefer
    ``from_json`` with an explicit schema when several keys are needed
    so the document is parsed once.
    """
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), f"$.{key}")
        .cast("long")
        .alias(key),
    )


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window × event_type aggregation (batch form).

    ``F.window`` on a naive timestamp aligns to wall-clock hours under
    the UTC session timezone — identical buckets to
    ``date_trunc('hour', ts)``. Single shuffle on (window, type).
    """
    # exact-decimal mean, decimal END TO END: double summation is
    # order-dependent, and with 2-dp inputs group means often land
    # EXACTLY on a .00005 boundary where Spark's round (HALF_UP on
    # the double's shortest string repr) and an exact-decimal round
    # disagree by 1 ulp — observed at sf0.1. Decimal sum ÷ count stays
    # exact, decimal round is well-defined HALF_UP, and only the final
    # rounded value is cast to double.
    exact_mean = F.round(
        F.sum(F.col("value").cast("decimal(28,8)"))
        / F.count(F.col("value")),
        4,
    ).cast("double")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_mean.alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via lag + cumulative sum.

    A new session starts when the gap to the previous event of the
    same user exceeds ``gap_minutes``. Window ordering includes
    event_id as tiebreaker so equal timestamps are deterministic.
    Two window passes over ONE shuffle (both windows share the
    user_id partitioning, so Spark reuses the exchange), then the
    session aggregation reuses the same partitioning — check the plan:
    a single Exchange feeds all three.

    Streaming equivalent: ``F.session_window`` in
    :mod:`etl_gcp_spark.streaming.events`.
    """
    order = [F.col("ts"), F.col("event_id")]
    by_user = Window.partitionBy("user_id").orderBy(*order)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(by_user).cast("long")
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    running = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_id = with_flag.withColumn(
        "session_id", F.sum("new_session").over(running).cast("long")
    )
    return with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def asof_last_event(
    events: DataFrame,
    *,
    probe_type: str = "purchase",
    build_type: str = "click",
) -> DataFrame:
    """As-of join: for each probe event, the latest build-side event
    with ``build.ts <= probe.ts`` for the same user.

    Composition (no Spark primitive for as-of): tag both sides, union,
    sort within user by (ts, side) — build rows sort BEFORE probe rows
    at equal ts so `<=` semantics hold — and carry the last non-null
    build timestamp forward with ``last(..., ignorenulls)``. One
    shuffle on user_id, no range explosion; equivalent plans via a
    range join would be O(n·m) per user.

    DuckDB oracle equivalent: ``ASOF LEFT JOIN ... ON user_id = user_id
    AND probe.ts >= build.ts``.
    """
    build = events.filter(F.col("event_type") == build_type).select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("build_ts"),
    )
    probe = events.filter(F.col("event_type") == probe_type).select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("build_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = build.unionByName(probe).withColumn(
        "last_build_ts", F.last("build_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_build_ts").alias(f"last_{build_type}_ts"),
    )


def sliding_window_stats(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows; ``F.window`` expands them JVM-side).

    Output is one row per (window_start, event_type) — the batch twin
    of a sliding-window streaming aggregation.
    """
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def daily_top_event_types(events: DataFrame, *, k: int = 3) -> DataFrame:
    """Top-k event types per day by volume (agg → rank window).

    The rank window partitions by day — the same key the aggregation
    grouped on — so the window reuses the aggregation's partitioning
    where AQE allows; ties break on event_type.
    """
    daily = events.groupBy(
        F.to_date("ts").alias("event_day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_day").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


PROPS_SCHEMA = "k long"


def parse_props(events: DataFrame) -> DataFrame:
    """Schema-declared JSON parsing: ``from_json`` with an explicit
    struct, projected once.

    The scale-preferred alternative to per-key ``get_json_object``
    (:func:`extract_props_key`): the document is parsed a single time
    however many fields are read, the parsed struct prunes like any
    other nested column, and malformed documents yield NULL structs
    instead of failing. Adding fields is a schema edit, not another
    parse.
    """
    parsed = events.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), PROPS_SCHEMA).alias("p"),
    )
    return parsed.select(
        "event_id",
        "event_type",
        F.col("p.k").alias("k"),
        F.col("p").isNotNull().alias("props_valid"),
    )


def time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hour ⊂ day ⊂ week
    aggregates in ONE pass.

    ROLLUP over (week, day, hour) emits hour-level rows plus daily,
    weekly and grand-total subtotals from a single Expand + hash
    aggregate — the batch analog of a continuous aggregate hierarchy,
    with no self-unions and one shuffle. NULL granularity columns
    mark the subtotal level (standard ROLLUP semantics).
    """
    truncated = events.select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return truncated.rollup("week", "day", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,8)")).cast("decimal(28,8)"),
            4,
        ).cast("double").alias("total_value"),
    )


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Time-grid gap filling: one row per (user, hour) between the
    user's first and last activity — zero-filled event counts plus a
    forward-filled activity state (the last event_type seen).

    The hourly grid is generated per user with ``sequence`` + explode
    (no driver-side calendar, no cross join against a global grid —
    each user's span stays in its own partition), and forward fill is
    ``last(ignorenulls)`` over an unbounded-preceding frame: one
    shuffle on user_id total. The in-hour state tie-break is
    ``max_by(event_type, event_id)`` — deterministic because event
    ids are unique.
    """
    hours = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("__h0"),
        F.date_trunc("hour", F.max("ts")).alias("__h1"),
    )
    grid = hours.select(
        "user_id",
        F.explode(
            F.sequence("__h0", "__h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max_by("event_type", "event_id").alias("__last_type"),
    )
    ff = Window.partitionBy("user_id").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("__n", F.lit(0)).alias("n_events"),
            F.last("__last_type", ignorenulls=True)
            .over(ff)
            .alias("state_type"),
        )
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` once into a binary variant, ``variant_get`` typed
    paths out of it — the open-schema path for event payloads whose
    keys are not known at write time.

    VARIANT beats string re-parsing at scale: the JSON text is parsed
    ONCE into a binary encoding and every subsequent path access is a
    cheap binary probe, where ``get_json_object`` re-tokenizes the
    string per extraction. With payloads stored as a variant column in
    parquet, Spark 4 also pushes shredded-field pruning to the scan.
    NULL/absent keys degrade to NULL (count skips them), so ragged
    payloads need no schema migration.
    """
    typed = events.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
    )
    return (
        typed.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str] = ["signup", "view", "click", "purchase"],
) -> DataFrame:
    """Ordered-funnel conversion: users reaching each stage IN ORDER.

    Stage k counts a user only if a stage-k event happened strictly
    after that user's stage-(k-1) entry time. One shuffle total: all
    per-stage entry times are min-over-user window expressions on the
    SAME partitioning (user_id), so Catalyst plans one Exchange and
    chains Window operators; the k-step dependency (stage k's window
    reads stage k-1's column) forces chained selects, not extra
    shuffles. Output: (stage, n_users, conversion_pct) with
    conversion relative to the first stage.
    """
    df = events.select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    prev = None
    for k, stage in enumerate(stages):
        cond = F.col("event_type") == stage
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        col = f"__t{k}"
        df = df.withColumn(col, F.min(F.when(cond, F.col("ts"))).over(w))
        prev = col
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"__t{k}").alias(f"__t{k}") for k in range(len(stages))]
    )
    counts = per_user.agg(
        *[
            F.count(f"__t{k}").cast("bigint").alias(f"__n{k}")
            for k in range(len(stages))
        ]
    )
    stage_rows = None
    for k, stage in enumerate(stages):
        row = counts.select(
            F.lit(k + 1).cast("int").alias("stage_no"),
            F.lit(stage).alias("stage"),
            F.col(f"__n{k}").alias("n_users"),
            F.round(F.col(f"__n{k}") * 100.0 / F.col("__n0"), 4).alias(
                "conversion_pct"
            ),
        )
        stage_rows = row if stage_rows is None else stage_rows.unionByName(row)
    return stage_rows


def retention_cohorts(events: DataFrame, *, max_weeks: int = 4) -> DataFrame:
    """Weekly retention triangle: cohort = week of a user's first
    event; cell (cohort, offset) = distinct users of that cohort
    active ``offset`` weeks later.

    Two aggregations: first-seen per user (shuffle on user_id), then
    (cohort, offset) counts (shuffle on the cohort key). The
    first-seen frame re-joins events on user_id — at scale both sides
    are already hash-partitioned on user_id, so AQE plans a
    co-partitioned sort-merge join with no extra exchange on the
    events side.
    """
    weeks = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        weeks.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.floor(
                (F.unix_date(F.col("wk").cast("date"))
                 - F.unix_date(F.col("cohort_week").cast("date"))) / 7
            ).cast("int"),
        )
        .filter(F.col("week_offset") < max_weeks)
        # DATE output (not the truncated timestamp): engines disagree
        # on date_trunc('week')'s return type, and the week boundary
        # is a calendar fact, not a time instant
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def session_window_stats(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessions via the native ``session_window`` operator.

    Same semantics as :func:`sessionize` (lag + running-sum islands)
    but expressed with Spark's built-in session window, which merges
    overlapping [ts, ts+gap) intervals per key inside one
    aggregation — no window-function sort pass, and the SAME
    expression works under Structured Streaming with state cleanup
    (the lag/cumsum form is batch-only). Session end is
    last_event + gap by definition (built-in semantics); the islands
    oracle reproduces it as max(ts) + gap.
    """
    g = f"{gap_minutes} minutes"
    return (
        events.groupBy("user_id", F.session_window("ts", g))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """Regression aggregates (regr_slope / regr_intercept / corr):
    per-type linear trend of event value over time.

    One codegen'd aggregation pass — the moment sums (Σx, Σy, Σxy,
    Σx², n) combine map-side, so the shuffle carries five doubles per
    group regardless of row count. x = fractional days since
    2024-01-01 keeps slope magnitudes O(1) so 6-dp rounding is
    stable across engines (verified vs DuckDB's regr_* family).
    """
    x = (F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )) / F.lit(86_400_000_000.0)
    return (
        events.select("event_type", x.alias("x"), F.col("value").alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("regr_slope(y, x)"), 6).alias("slope_per_day"),
            F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
            F.round(F.corr("y", "x"), 6).alias("corr_xy"),
        )
    )


def event_type_lift(events: DataFrame) -> DataFrame:
    """Market-basket LIFT between event types at the user level:
    lift(a,b) = P(a,b) / (P(a)·P(b)) over users — >1 means the two
    behaviors co-occur beyond chance (cross-sell / funnel-adjacency
    signal), <1 means they repel. The log-free rational form keeps
    the whole statistic in exact integer arithmetic until ONE final
    division: lift = (n_both · n_users) / (n_a · n_b), all BIGINT —
    the engine's standard no-transcendentals posture (PMI is the log
    of this; ranking by lift IS ranking by PMI).

    Shape: one distinct (user, type) projection (map-side), a
    user-keyed self-join whose per-user fan-out is bounded by the
    TYPE-domain squared (tiny, whatever the row count), and
    broadcast joins of the per-type user counts. Output:
    (type_a, type_b, n_both, lift 4 dp) for every co-occurring pair,
    type_a < type_b.
    """
    ut = events.select("user_id", "event_type").dropDuplicates()
    # scalar stays IN the plan (1-row broadcast) — no driver action
    n_users = ut.agg(
        F.countDistinct("user_id").alias("__n_users")
    )
    singles = ut.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        both.join(
            F.broadcast(singles.withColumnRenamed("t", "type_a")), "type_a"
        )
        .withColumnRenamed("c", "__ca")
        .join(
            F.broadcast(singles.withColumnRenamed("t", "type_b")), "type_b"
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("__n_users"))
                / (F.col("__ca") * F.col("c")).cast("double"),
                4,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


def weekly_active_users(
    events: DataFrame, *, window_days: int = 7
) -> DataFrame:
    """Trailing-N-day ACTIVE USERS per day (WAU when N=7) — the
    engagement metric a sum-over-window cannot express: DISTINCT is
    not decomposable over overlapping windows, so the rolling frame
    trick behind ``rolling_weekly_spend`` silently overcounts users
    active on several days.

    Shape: events collapse map-side to distinct (day, user) pairs
    FIRST; each pair then fans out to the ≤N trailing report days it
    keeps a user active for (a sequence explode — N rows per pair,
    the exact inclusion-set materialized), and one count-distinct per
    report day closes it. Cost is N·|daily-active pairs| — linear in
    activity with a fixed small constant, no self-join, no
    quadratic day × day anything. Report days with zero trailing
    activity simply emit no row (spine-join them if a dense calendar
    is needed). Output: (day, n_active 6-dp-free BIGINT).
    """
    # NULL timestamps are excluded EXPLICITLY: Spark's explode would
    # silently drop the NULL-day fan-out while a SQL replay groups it
    # under a NULL report day — a cross-engine divergence this filter
    # removes at the source (NULL-time activity dates nothing anyway)
    day = F.date_trunc("day", F.col("ts"))
    pairs = (
        events.filter(F.col("ts").isNotNull())
        .select(day.alias("d"), "user_id")
        .dropDuplicates()
    )
    fan = pairs.select(
        F.explode(
            F.sequence(
                F.col("d"),
                F.col("d") + F.make_dt_interval(F.lit(window_days - 1)),
                F.make_dt_interval(F.lit(1)),
            )
        ).alias("report_day"),
        "user_id",
    )
    return (
        fan.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("report_day")
    )


def cusum_change_point(events: DataFrame) -> DataFrame:
    """CUSUM change-point detection on the hourly event-rate series —
    the sequential-monitoring classic (Page 1954): the cumulative sum
    of deviations from the overall mean peaks exactly where the
    series' level shifts, and the arg-max of |S_t| is the estimated
    change point.

    EXACT integer arithmetic throughout: with hourly counts c_i,
    S_t = Σ_{i≤t}(c_i − c̄) is rationally scaled to
    T_t = n·Σ_{i≤t} c_i − t·total — all BIGINT, so the arg-max is
    decided on exact integers (ties → earliest hour) and the single
    final division rescales for reporting. The cumulative window runs
    over HOURS (bounded by the time span, not the row count — same
    domain-not-rows argument as ks_drift). Output: 1 row
    (change_hour, n_hours, cusum_stat 6 dp).
    """
    from pyspark.sql import Window

    # NULL timestamps excluded: a NULL hour group would sort NULLS
    # FIRST in Spark's window but NULLS LAST in a SQL replay —
    # shifting every cumulative sum against the oracle
    hourly = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded: ≤ |corpus span in hours| rows — `hourly` is the
    # post-aggregation series (one row per hour), not the event log
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    cum = hourly.select(
        "h",
        F.sum("c").over(w).alias("cum_c"),
        # bounded: same ≤ |hours| post-agg frame as `w` above
        F.row_number().over(Window.orderBy("h")).alias("t"),
    )
    totals = hourly.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n")
    )
    t_stat = F.abs(
        F.col("n") * F.col("cum_c") - F.col("t") * F.col("total")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.col("h").alias("change_hour"),
            F.col("n").alias("n_hours"),
            t_stat.alias("__T"),
        )
        .orderBy(F.col("__T").desc(), F.col("change_hour"))
        .limit(1)
        .select(
            "change_hour",
            "n_hours",
            F.round(
                F.col("__T") / F.col("n_hours").cast("double"), 6
            ).alias("cusum_stat"),
        )
    )


def wow_growth(events: DataFrame) -> DataFrame:
    """Week-over-week growth of event volume and value — the BI
    trend table: weekly totals plus their lag-1 percent change.
    Percent change is computed from exact integer counts and
    decimal-exact value sums, one division each, 4 dp — replayable.
    The lag window is a single ordered pass over WEEKS (domain-
    bounded: one row per week, so the unpartitioned window holds
    at most a few thousand rows even over decades — the "No
    Partition Defined" warning is expected and safe here; a lag
    across week boundaries cannot be partitioned without breaking
    its semantics). NULL timestamps are excluded up front: Spark
    orders NULLS FIRST while most SQL engines order NULLS LAST, so
    a NULL week group would shift the first real week's growth.
    Output: (week_start, n_events, total_value, n_growth,
    value_growth) — growth NULL for the first week.
    """
    from pyspark.sql import Window

    weekly = events.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("week", F.col("ts")).alias("week_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast(
                "decimal(28,8)"
            )),
            4,
        ).cast("double").alias("total_value"),
    )
    # bounded: ≤ |corpus span in weeks| rows — `weekly` is the
    # post-aggregation series, one row per calendar week
    w = Window.orderBy("week_start")
    prev_n = F.lag("n_events").over(w)
    prev_v = F.lag("total_value").over(w)
    return weekly.select(
        "week_start",
        "n_events",
        "total_value",
        F.round(
            (F.col("n_events") - prev_n) / prev_n.cast("double"), 4
        ).alias("n_growth"),
        F.round(
            (F.col("total_value") - prev_v) / prev_v, 4
        ).alias("value_growth"),
    ).orderBy("week_start")


def watermark_sizing_report(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
) -> DataFrame:
    """Measured event-time lateness histogram — the report that
    answers "what watermark should this stream set?". For each event,
    lateness is how far its event time sits behind the latest event
    time already seen in ARRIVAL order (``arrival_col`` is the
    arrival sequence — an ingest offset / kafka offset in
    production): ``running_max(ts) − ts``. Events advancing the clock
    are on-time; the histogram of the rest is precisely the
    distribution a watermark must cover (a '1 hour' watermark drops
    exactly the ``>=1h`` bucket).

    The running max is a window over the arrival sequence — the ONE
    inherently sequential scan this semantics requires. Lateness is
    defined per source partition (arrival order only exists within a
    partition); this operator computes one partition's report — at
    scale, run it per Kafka partition by adding the partition to the
    window's partitionBy, which makes the plan fully parallel. NULL
    ts / arrival rows are excluded on both sides (unrankable), the
    codebase's NULL-ordering convention.

    Output: (bucket, bucket_order, n_events, max_lateness_sec) —
    exact integer bucketing (microsecond arithmetic), no floats
    anywhere, so the report replays bit-identically.
    """
    us = F.unix_micros(F.col(ts_col))
    # bounded: one source partition by CONTRACT, not by data — the
    # running max over arrival order is the one inherently
    # sequential scan this semantics requires (docstring); at scale
    # add the kafka/source partition to partitionBy and the plan is
    # fully parallel
    w = (
        Window.orderBy(F.col(arrival_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_us = F.greatest(
        F.max(us).over(w) - us, F.lit(0).cast("long")
    )
    # floor-division, not /-then-cast: Spark's double->long cast
    # truncates while DuckDB's rounds — floor agrees everywhere
    late_sec = F.floor(late_us / F.lit(1_000_000)).cast("long")
    bucket = (
        F.when(late_us == 0, F.lit(0))
        .when(late_sec < 60, F.lit(1))
        .when(late_sec < 300, F.lit(2))
        .when(late_sec < 3600, F.lit(3))
        .otherwise(F.lit(4))
    )
    names = F.create_map(
        F.lit(0), F.lit("on_time"),
        F.lit(1), F.lit("late_lt_1m"),
        F.lit(2), F.lit("late_lt_5m"),
        F.lit(3), F.lit("late_lt_1h"),
        F.lit(4), F.lit("late_ge_1h"),
    )
    return (
        events.filter(
            F.col(ts_col).isNotNull() & F.col(arrival_col).isNotNull()
        )
        .select(bucket.alias("bucket_order"), late_sec.alias("__late"))
        .groupBy("bucket_order")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("__late").alias("max_lateness_sec"),
        )
        .select(
            names[F.col("bucket_order")].alias("bucket"),
            F.col("bucket_order").cast("int"),
            "n_events",
            "max_lateness_sec",
        )
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next = b | current = a) — the behavioral model
    behind next-action prediction, anomaly scoring (improbable
    transitions), and sessionized clickstream analysis.

    Ordering is (ts, event_id) within each user — the event_id
    tiebreak makes the lag deterministic even under equal
    timestamps. NULL ts / event_type / user_id rows are excluded on
    both engine and oracle sides (Spark windows order NULLS FIRST,
    ANSI oracles NULLS LAST — the wow_growth divergence class).

    Output: (prev_type, event_type, n_transitions, p) with p = n /
    Σ n over prev_type as one IEEE division on exact counts, rounded
    to 6 dp.

    Scale: one shuffle on user_id for the lag window (each user's
    sequence is processed within its partition), then a groupBy on
    the (prev, cur) pair — at most |types|² rows, map-side combined.
    The per-prev normalizing sum runs over the aggregated matrix
    (≤ |types|² rows), not the event stream.
    """
    seq = events.filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    ).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        seq.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_prev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_prev).cast("double"),
            6,
        ).alias("p"),
    )


def ewma_by_user(
    events: DataFrame, *, last_n: int = 64
) -> DataFrame:
    """Per-user exponentially weighted moving average of event value
    (α = 1/2) — the smoothed activity level behind engagement scores
    and burst detection, and the engine's showcase of a DETERMINISTIC
    sequential fold: s₀ = x₀, sₜ = 0.5·xₜ + 0.5·sₜ₋₁.

    α is FIXED at 1/2 so both multiplications are by an exact power
    of two (error-free in binary FP); each fold step rounds only at
    the addition, and the fold order is pinned by (ts, event_id), so
    the whole chain is a fixed expression tree that replays
    bit-for-bit in a SQL oracle (DuckDB ``list_reduce`` folds left
    with the first element as the initial accumulator — matched here
    with an explicit init over the tail slice).

    Only the LAST ``last_n`` events per user enter the fold — a term
    ``last_n`` steps back is damped by 2^-64 (below any output
    rounding), so the cap changes nothing numerically while bounding
    the per-group array a 100-TB history would otherwise collect;
    both engines apply the identical cap, so replay is exact either
    way. One shuffle on user_id; the fold runs on arrays of ≤
    ``last_n`` doubles.

    Output: (user_id, n_used, last_value, ewma).
    """
    rows = events.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select("user_id", "ts", "event_id", "value")
    # cap BEFORE collecting: the rank window and the collect share the
    # same user_id shuffle (one exchange), and no array ever exceeds
    # last_n even for a user with millions of events
    recency = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rows = rows.withColumn("__rn", F.row_number().over(recency)).filter(
        F.col("__rn") <= last_n
    )
    by_user = (
        rows.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("__seq")
        )
        .select(
            "user_id",
            F.transform(F.col("__seq"), lambda x: x["value"]).alias(
                "__vals"
            ),
        )
        .select(
            "user_id",
            F.slice(
                F.col("__vals"),
                F.greatest(
                    F.lit(1), F.size("__vals") - F.lit(last_n - 1)
                ),
                F.lit(last_n),
            ).alias("__tail"),
        )
    )
    init = F.element_at(F.col("__tail"), 1)
    rest = F.slice(F.col("__tail"), 2, F.size("__tail") - 1)
    ewma = F.aggregate(
        rest,
        init,
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return by_user.select(
        "user_id",
        F.size("__tail").cast("long").alias("n_used"),
        F.element_at(F.col("__tail"), -1).alias("last_value"),
        F.round(ewma, 6).alias("ewma"),
    )


def trend_report(events: DataFrame) -> DataFrame:
    """Robust trend detection over the weekly event-count series:
    Mann–Kendall S and z (is there a monotone trend?) plus the
    Theil–Sen slope (how steep, robust to outlier weeks) — the
    nonparametric pair that replaces eyeballing a dashboard, and the
    robust complement to :func:`cusum_change_point`'s level-shift
    detector.

    Replay discipline: S = Σ_{i<j} sign(c_j − c_i) is pure integer
    arithmetic; the variance uses the exact tie-corrected integer
    numerator (n(n−1)(2n+5) − Σ t(t−1)(2t+5)) before ONE division by
    18.0 and one sqrt — a fixed correctly-rounded tree. Slopes are
    one IEEE division each on exact integers (count delta over
    week-index delta); the median picks the middle sorted element
    (mean of the two middles for even counts — one add, one exact
    halving), so every emitted value replays bit-for-bit.

    Scale: the corpus-sized work is ONE map-side-combined weekly
    aggregation; everything after runs on the ≤ |weeks| frame
    (pairwise join is |weeks|² ≈ 2.7K rows for a 52-week year —
    driver-free, but never data-sized). NULL timestamps excluded.

    Output (1 row): n_weeks, s_statistic, z_mk, theil_sen_slope.
    """
    weekly = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    base = weekly.agg(F.min("wk").alias("w0"))
    idx = weekly.crossJoin(F.broadcast(base)).select(
        (
            (F.unix_date(F.col("wk")) - F.unix_date(F.col("w0"))) / 7
        )
        .cast("long")
        .alias("i"),
        "c",
    )
    a = idx.select(F.col("i").alias("ia"), F.col("c").alias("ca"))
    b = idx.select(F.col("i").alias("ib"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        F.signum((F.col("cb") - F.col("ca")).cast("double"))
        .cast("long")
        .alias("sgn"),
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("ib") - F.col("ia")).cast("double")
        ).alias("slope"),
    )
    stats = pairs.agg(
        F.sum("sgn").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    n = idx.agg(F.count(F.lit(1)).alias("n_weeks"))
    ties = (
        idx.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_num")
        )
    )
    ranked = pairs.select(
        "slope",
        # bounded: ≤ |weeks|² rows — `pairs` is the week-index
        # self-join of the post-aggregation weekly series (52 weeks
        # → 1,326 pairs), never the event log
        F.row_number()
        .over(Window.orderBy(F.col("slope")))
        .alias("rn"),
    )
    med = (
        ranked.crossJoin(
            F.broadcast(stats.select("n_pairs"))
        )
        # middle rank(s): odd count selects one row twice-over (both
        # expressions land on (n+1) div 2), even count selects n/2
        # and n/2+1 — integer div, NOT `/` (long/long is double)
        .filter(
            (F.col("rn") == F.expr("(n_pairs + 1) div 2"))
            | (F.col("rn") == F.expr("n_pairs div 2 + 1"))
        )
        .agg(
            (F.sum("slope") / F.count(F.lit(1)).cast("double")).alias(
                "theil_sen"
            )
        )
    )
    nw = F.col("n_weeks").cast("double")
    var = (
        nw * (nw - 1.0) * (2.0 * nw + 5.0)
        - F.col("tie_num").cast("double")
    ) / F.lit(18.0)
    s = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (s - 1.0) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (s + 1.0) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return (
        stats.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(med))
        .select(
            "n_weeks",
            "s_stat",
            F.round(z, 6).alias("z_mk"),
            F.round(F.col("theil_sen"), 6).alias("theil_sen_slope"),
        )
    )


def seasonality_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonality per event type: counts folded across
    all days onto the 24-hour clock plus each type's share per hour —
    the load profile that sizes streaming capacity and flags
    diurnal-pattern drift (compare two periods' profiles with
    psi_drift). Distinct from :func:`hourly_event_stats`, which
    buckets by calendar hour instance rather than clock position.

    One map-side-combined aggregation to ≤ 24·|types| rows; the share
    divides by the per-type total via a window over the aggregated
    frame (never the events). NULL timestamps excluded on both
    engine and oracle sides.

    Output: (event_type, hour_of_day, n_events, share) — share is
    one IEEE division on exact counts, rounded 6 dp.
    """
    hourly = (
        events.filter(
            F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        )
        .groupBy(
            "event_type",
            F.hour(F.col("ts")).cast("int").alias("hour_of_day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    per_type = Window.partitionBy("event_type")
    return hourly.select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(per_type).cast("double"),
            6,
        ).alias("share"),
    )


def session_rules(
    events: DataFrame, *, gap_minutes: int = 30, min_pair: int = 5
) -> DataFrame:
    """Association rules over session baskets: which event types
    co-occur in the same session beyond chance — market-basket
    support / confidence / lift with sessions as transactions (the
    cross-sell / next-action analysis classic, run on clickstreams
    instead of carts).

    Sessions come from the same lag+cumsum assignment as
    :func:`sessionize`; the basket is the DISTINCT (session, type)
    set, so the pair self-join is keyed by the session — candidates
    per session are bounded by |types|² (a handful), never by events,
    and the join reuses the session shuffle key. All ratios are one
    IEEE division on exact integer counts (lift's numerator is the
    exact integer product n_pair·N), rounded to 6 dp. NULL
    ts/user/type rows are excluded up front on both sides.

    Output: (type_a, type_b, n_pair, support, confidence_a_to_b,
    lift) for pairs in ≥ ``min_pair`` sessions, type_a < type_b.
    """
    ev = events.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select("user_id", "ts", "event_id", "event_type")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts")).over(by_user).cast("long")
    )
    running = Window.partitionBy("user_id").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    baskets = (
        ev.withColumn(
            "__new",
            F.when(
                gap.isNull() | (gap > gap_minutes * 60), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_id", F.sum("__new").over(running).cast("long")
        )
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    totals = baskets.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("__n_sessions")
    )
    type_counts = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n_type")
    )
    a = baskets.select(
        "user_id", "session_id", F.col("event_type").alias("type_a")
    )
    b = baskets.select(
        "user_id", "session_id", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
    )
    ca = type_counts.select(
        F.col("event_type").alias("type_a"),
        F.col("__n_type").alias("__n_a"),
    )
    cb = type_counts.select(
        F.col("event_type").alias("type_b"),
        F.col("__n_type").alias("__n_b"),
    )
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "n_pair",
            F.round(
                F.col("n_pair").cast("double")
                / F.col("__n_sessions").cast("double"),
                6,
            ).alias("support"),
            F.round(
                F.col("n_pair").cast("double")
                / F.col("__n_a").cast("double"),
                6,
            ).alias("confidence_a_to_b"),
            F.round(
                (F.col("n_pair") * F.col("__n_sessions")).cast(
                    "double"
                )
                / (F.col("__n_a") * F.col("__n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
