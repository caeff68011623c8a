"""Event-sequence analytics: ordered funnels, cohort retention, and
gap-filled resampling (SURVEY.md §2b X43-X45).

The reference has no time-series surface at all; these are the
product-analytics shapes (funnel / retention / downsample) every
event warehouse runs, expressed so each one costs a single hash
shuffle on its natural key:

- ``funnel_stages``: one sort per user partition; the stage cascade is
  a chain of running-``min`` window columns over the SAME
  (partition, order) spec, so Catalyst plans one Exchange + one Sort
  and stacks the Window operators on top — no join, no second shuffle,
  no per-user collect.
- ``retention_cohorts``: first-touch per user then (cohort, offset)
  distinct-user counts — two key-local aggregations; the user→cohort
  join is AQE-broadcastable when the user dimension aggregates small
  and degrades to a co-partitioned shuffle join (both sides hashed on
  ``user_id``) when it doesn't.
- ``resample_gap_fill``: the dense time spine is GENERATED
  (``sequence`` + ``explode`` from a 1-row global min/max aggregate
  cross-joined onto the distinct key set), never materialized as an
  input table, and the forward fill is ``last(..., ignorenulls)`` over
  the spine order — one window pass, no driver loop over hours.

Scale notes (100 TB): every shape here shuffles on ``user_id`` or the
series key — high-cardinality, naturally balanced keys. The funnel's
strictly-after semantics (stage N+1 must occur AFTER the first valid
stage-N event) are tie-stable: validity uses strict ``<`` on the
running min, so equal-timestamp reorderings cannot flip a stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Ordered-funnel conversion counts.

    A user completes stage ``i`` when an event of type ``stages[i]``
    occurs STRICTLY AFTER the user's first completion of stage
    ``i-1`` (classic ordered funnel; stage 0 is the first event of
    that type). Returns one row per stage:
    ``(stage_idx, stage, n_users, pct_of_first)``.

    Single Exchange on ``user_col``; the per-stage "first valid
    timestamp" columns are running mins over one shared window spec,
    then one per-user aggregate collapses the partition.
    """
    from medical_examination_data_etl_system_spark.operators.curation import _temp_name

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts = F.col(ts_col)
    df = events
    valid_cols: list[str] = []
    prev_first: Column | None = None
    for i, stage in enumerate(stages):
        # collision-free scratch names (ADVICE r4 discipline)
        vcol = _temp_name(df, f"_funnel_valid_{i}")
        if prev_first is None:
            df = df.withColumn(vcol, F.when(F.col(type_col) == stage, ts))
        else:
            # strict <: an equal-timestamp prior stage does not count,
            # so tie order within a timestamp cannot change the result.
            df = df.withColumn(
                vcol, F.when((F.col(type_col) == stage) & (prev_first < ts), ts)
            )
        fcol = _temp_name(df, f"_funnel_first_{i}")
        df = df.withColumn(fcol, F.min(F.col(vcol)).over(w))
        prev_first = F.col(fcol)
        valid_cols.append(vcol)

    per_user = df.groupBy(user_col).agg(
        *[F.min(v).alias(f"s{i}") for i, v in enumerate(valid_cols)]
    )
    counts = per_user.agg(
        *[F.count(f"s{i}").alias(f"n{i}") for i in range(len(stages))]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, stage in enumerate(stages)
        ]
    )
    return (
        counts.select(F.col("n0"), F.explode(stage_rows).alias("r"))
        .select(
            F.col("r.stage_idx").alias("stage_idx"),
            F.col("r.stage").alias("stage"),
            F.col("r.n_users").alias("n_users"),
            F.round(F.col("r.n_users") / F.col("n0"), 4).alias("pct_of_first"),
        )
        .orderBy("stage_idx")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Day-granularity cohort retention.

    Cohort = each user's first active day; a (cohort_day, day_offset)
    cell counts the distinct cohort users active ``day_offset`` days
    after their first day. Returns
    ``(cohort_day, day_offset, n_users)``.

    Two aggregations + one equi-join on ``user_col``: first-touch per
    user (hash agg), join back to the user's activity days (AQE
    broadcasts the aggregated side when small; co-partitioned shuffle
    otherwise), then a distinct count per cell.
    """
    day = F.to_date(ts_col)
    first_day = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    activity = events.select(user_col, day.alias("active_day")).distinct()
    cells = activity.join(first_day, user_col).select(
        "cohort_day",
        F.datediff("active_day", "cohort_day").alias("day_offset"),
        user_col,
    )
    if max_offset_days is not None:
        cells = cells.filter(F.col("day_offset") <= max_offset_days)
    return (
        cells.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def resample_gap_fill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Downsample to a fixed step per key, generating empty buckets and
    forward-filling the aggregate into them.

    Returns ``(key, bucket_start, n_events, sum_value, filled_sum,
    was_gap)`` where ``filled_sum`` carries the last non-empty bucket's
    ``sum_value`` forward across gaps (null before the first
    observation).

    The dense spine is generated, not stored: a one-row global
    min/max aggregate (broadcast) cross-joined with the distinct key
    set, ``sequence()``-exploded to one row per (key, bucket). The
    actuals then LEFT-join on (key, bucket) — co-partitioned hash
    join — and one window pass per key does the forward fill. Spine
    size is |keys| × |buckets|: generation cost is independent of the
    fact-table row count, which is what makes this shape viable when
    the facts are 100 TB but the spine is thousands of rows per key.
    """
    base = events.select(
        F.col(key_col).alias("k"),
        F.window(ts_col, step)["start"].alias("bucket_start"),
        F.col(value_col).alias("v"),
    )
    actual = base.groupBy("k", "bucket_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("v"), 2).alias("sum_value"),
    )
    bounds = base.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    keys = base.select("k").distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(actual, ["k", "bucket_start"], "left")
        .select(
            F.col("k").alias(key_col),
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "sum_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_sum"),
            F.col("sum_value").isNull().alias("was_gap"),
        )
        .orderBy(key_col, "bucket_start")
    )


def ewma(
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.25,
    lookback: int = 24,
) -> Column:
    """Bounded-lookback exponentially-weighted moving average of
    ``value_col`` per ``key_col`` partition: a left fold of
    ``acc·(1−α) + x·α`` over the last ``lookback``+1 values in
    ``order_cols`` order, seeded at 0.0.

    Expressed as ``collect_list`` over a ROWS window (frame order is
    deterministic given a total order) + ``F.aggregate`` — the fold runs
    JVM-side on the 25-element array; no Python, no self-join, one
    Exchange on the key. The bounded frame is what makes the recurrence
    expressible WITHOUT per-row state: weights beyond the lookback decay
    below (1−α)^24 ≈ 1e-3 of a fresh observation and the truncation is
    part of the operator's definition (both engines truncate
    identically), so the result is bit-exact reproducible — every fold
    step is an IEEE-correctly-rounded op applied in the same order with
    exactly-representable α=0.25 coefficients, which is what lets a SQL
    oracle (``list_reduce`` over the same frame) hash-match it.

    NULL semantics match the SQL oracle's list fold exactly: a NULL
    anywhere in the frame poisons the whole fold to NULL (collect_list
    would silently DROP nulls and shift the window — diverging from
    ``list()`` — so a frame-has-null flag restores the poisoning).

    Returns the EWMA Column; attach with ``withColumn``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, Window.currentRow)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    frame_has_null = F.max(F.col(value_col).isNull().cast("int")).over(w)
    fold = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return F.when(frame_has_null == 1, F.lit(None).cast("double")).otherwise(fold)


def holt(
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.25,
    beta: float = 0.25,
    lookback: int = 24,
) -> Column:
    """Holt linear (level+trend) exponential smoothing — EWMA's
    two-accumulator sibling: a bounded left fold over
    ``struct(level, trend)`` with
    ``l' = α·x + (1−α)(l + b)``, ``b' = β(l' − l) + (1−β)·b``,
    returning the one-step-ahead forecast ``l + b`` per row.

    Same bit-exactness contract as ``ewma``: exactly-binary α/β, frame
    order pinned by ``order_cols``, every op IEEE-correctly-rounded in
    the same sequence. The trend update uses the EXPANDED form
    ``b' = βα·x − βα·l + (β(1−α)+1−β)·b`` (algebraically equal to the
    textbook ``β(l'−l)+(1−β)b``; all coefficients exactly binary for
    dyadic α/β) so NO subexpression repeats across the two state
    fields — DuckDB 1.0's lambda engine mis-evaluates a first-field
    reference inside the second struct field (probed: a.l resolves to
    the NEW l there), and a 2-element LIST accumulator with
    single-reference fields sidesteps it on the oracle side; the Spark
    fold uses the identical expanded tree so the doubles hash-match.
    NULL frames poison to NULL, matching the oracle's fold.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, Window.currentRow)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    frame_has_null = F.max(F.col(value_col).isNull().cast("int")).over(w)
    a, b1 = F.lit(alpha), F.lit(1.0 - alpha)
    ba = F.lit(beta * alpha)
    bb = F.lit(beta * (1.0 - alpha) + (1.0 - beta))
    fold = F.aggregate(
        vals,
        F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("b")),
        lambda acc, x: F.struct(
            (a * x + b1 * (acc["l"] + acc["b"])).alias("l"),
            (ba * x - ba * acc["l"] + bb * acc["b"]).alias("b"),
        ),
        lambda acc: acc["l"] + acc["b"],
    )
    return F.when(frame_has_null == 1, F.lit(None).cast("double")).otherwise(fold)
