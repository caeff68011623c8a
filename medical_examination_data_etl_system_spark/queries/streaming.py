"""Streaming queries in the driver battery: each drains a Structured
Streaming query over the events table with an availableNow trigger and
returns the materialized result, so streaming correctness sits in the
same DuckDB-oracle gate as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from medical_examination_data_etl_system_spark.queries import QueryDef
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries.relational import CMS_USER_COUNTS_SQL as _CMS_ORACLE
from medical_examination_data_etl_system_spark.streaming import (
    attribution_join,
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    running_ewma_stateful,
    sessionize_stateful,
    stream_session_counts,
    stream_sliding_counts,
    stream_tumbling_counts,
)


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_tumbling_hourly``: identical result via
    readStream + watermark + windowed agg, drained with availableNow."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_available_now(
        stream_tumbling_counts(stream), "q_stream_tumbling", output_mode="complete"
    )
    return out.orderBy("window_start", "event_type")


# Same oracle as the batch tumbling query — that is the point.
STREAM_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState): emits CLOSED
    sessions (a later event from the same user arrived ≥ 15 min after the
    session's last event); each user's trailing open session stays in
    state — so the oracle drops each user's last session."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_available_now(sessionize_stateful(stream, gap_minutes=15), "q_stream_sessions")
    return out.orderBy("user_id", "session_start")


STREAM_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)
ORDER BY user_id, session_start
"""


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: purchases attributed to
    same-user clicks within the prior 30 minutes. Two independent
    readStream sources over the same file; drained availableNow, so the
    result equals the batch interval join the oracle runs."""
    clicks = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    out = run_available_now(
        attribution_join(clicks, purchases, horizon_minutes=30), "q_stream_attrib"
    )
    return out.orderBy("purchase_id", "click_id")


STREAM_ATTRIBUTION_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       p.ts AS purchase_ts, c.ts AS click_ts,
       round(p.value, 2) AS purchase_value
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
"""


def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked dedup under simulated at-least-once
    delivery: TWO independent file streams over the same events (every
    row delivered twice) are unioned, then
    ``dropDuplicatesWithinWatermark`` on (user_id, event_type, ts)
    collapses the redelivery — the drained output is each distinct key
    exactly once, summarized per event type. The oracle is the batch
    DISTINCT, which is the exactly-once contract."""
    a = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    b = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    deduped = dedup_within_watermark(a.unionByName(b), ["user_id", "event_type", "ts"])
    out = run_available_now(deduped, "q_stream_dedup")
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("event_type")
    )


STREAM_DEDUP_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       max(ts) AS max_ts
FROM (SELECT DISTINCT user_id, event_type, ts FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def stream_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental-upsert materialized view: the event stream
    applied as a CDC upsert batch keyed by user (seq = event time,
    event_id tie-break) through foreachBatch + the batch MERGE, with
    snapshot-commit isolation. The converged view holds each user's
    LATEST event; summarized per event type. Oracle = the equivalent
    batch latest-per-key QUALIFY."""
    import tempfile

    from medical_examination_data_etl_system_spark.streaming import (
        UpsertParquetView,
        run_upsert_stream,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts", "value", "event_id", F.lit("U").alias("op")
    )
    d = tempfile.mkdtemp(prefix="upsert_view_")
    view = UpsertParquetView(
        f"{d}/view", key_cols="user_id", seq_col=["ts", "event_id"]
    )
    run_upsert_stream(stream, view, checkpoint=f"{d}/ckpt")
    return (
        view.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("event_type")
    )


STREAM_UPSERT_SQL = """
WITH latest AS (
  SELECT * FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(ts) AS max_ts
FROM latest
GROUP BY event_type
ORDER BY event_type
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with a STATIC
    dimension (customer market segment keyed to user_id) inside the
    streaming query, then a watermarked tumbling daily aggregate per
    segment. The static side needs no watermark — Spark re-plans it
    per micro-batch and broadcasts it under AQE, which is exactly the
    dimension-enrichment shape a 100 TB stream pipeline runs (facts
    stream, dims broadcast; no state for the join). Oracle = the batch
    join + date_trunc aggregate."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    from medical_examination_data_etl_system_spark.queries import load as _load

    dim = _load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(dim, "user_id")
    agged = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("day"), "c_mktsegment", "n_events", "sum_value"
        )
    )
    out = run_available_now(agged, "q_stream_static", output_mode="complete")
    return out.orderBy("day", "c_mktsegment")


STREAM_STATIC_SQL = """
SELECT date_trunc('day', e.ts) AS day, c.c_mktsegment,
       count(*) AS n_events, round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey - 1
GROUP BY 1, 2
ORDER BY day, c_mktsegment
"""




def stream_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_sliding_windows``: 1-hour windows
    every 30 minutes, drained availableNow in complete mode — the
    overlapping-window state the tumbling twin doesn't exercise."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_available_now(
        stream_sliding_counts(stream), "q_stream_sliding", output_mode="complete"
    )
    return out.orderBy("window_start")


STREAM_SLIDING_SQL = """
SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offsets
GROUP BY 1
ORDER BY window_start
"""


def stream_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming per user (merging-window
    state) — the built-in complement to the custom
    applyInPandasWithState sessionizer; drained availableNow it equals
    the batch session query, so the oracle is the same lag/cumsum
    sessionization — with the native END-INCLUSIVE merge boundary
    (split strictly past the gap; see events_session_windows, r12)."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_available_now(
        stream_session_counts(stream), "q_stream_session_builtin",
        output_mode="complete",
    )
    return out.orderBy("user_id", "session_start")


STREAM_SESSION_BUILTIN_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '15 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

def stream_running_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running EWMA as a custom stateful streaming operator
    (streaming/events.running_ewma_stateful) drained availableNow; the
    oracle replays the identical fold per user over the batch table, so
    the doubles hash-match without tolerance — bit-exact batch/stream
    consistency for a numeric accumulator."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_available_now(running_ewma_stateful(stream, alpha=0.25), "q_stream_ewma")
    return out.orderBy("event_id")


STREAM_EWMA_SQL = """
WITH framed AS (
  SELECT user_id, event_id,
         list(CAST(value AS DOUBLE))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS l
  FROM events
)
SELECT user_id, event_id,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l),
                   (a, b) -> a * 0.75 + b * 0.25) AS ewma
FROM framed ORDER BY event_id
"""


def stream_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built FROM THE STREAM: the 4x1024 md5 counter
    table accumulates as a streaming aggregation (update-free complete
    drain — a linear sketch is a pure running groupBy-sum, the state IS
    the sketch), then the batch estimator reads the drained counters.
    Same deterministic construction, so the result — top-10 exact-heavy
    users with their CMS estimates — shares agg_cms_user_counts'
    EXACT oracle verbatim: streaming sketch maintenance is hash-checked
    against a batch SQL rebuild, the mergeable-summaries contract in
    its streaming form (a counter table maintained incrementally equals
    one built from scratch)."""
    from medical_examination_data_etl_system_spark.operators.sketch import (
        _cms_bucket,
        cms_estimate,
    )
    from medical_examination_data_etl_system_spark.queries import load

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    coords = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("seed"),
                        _cms_bucket(F.col("user_id"), s, 1024).alias("bucket"),
                    )
                    for s in range(4)
                ]
            )
        ).alias("c")
    ).select("c.seed", "c.bucket")
    counters = run_available_now(
        coords.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("cnt")),
        "q_stream_cms",
        output_mode="complete",
    )
    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("user_id")).limit(10)
    est = cms_estimate(counters, top.select("user_id"), "user_id")
    return (
        top.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "user_id")
    )


def stream_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting maintained AS STREAMING STATE: the
    per-(event_type, 32k-bucket) bitmaps of agg_bitmap_distinct_parts'
    construction accumulate as a streaming aggregation — a bitmap is a
    mergeable summary, so the state update is bitmap OR and the drained
    state equals one built from scratch (the CMS query's contract, for
    a lossless summary). After the complete-mode drain, bitmap_count +
    a per-type sum read the exact distinct-user totals. Oracle: plain
    batch COUNT(DISTINCT) — streaming maintenance must reproduce it
    bit-for-bit."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    coords = stream.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    bitmaps = run_available_now(
        coords.groupBy("event_type", "bkt").agg(
            F.expr("bitmap_construct_agg(pos)").alias("bm"),
            F.count(F.lit(1)).alias("nrows"),
        ),
        "q_stream_bitmap",
        output_mode="complete",
    )
    return (
        bitmaps.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
            F.sum("nrows").cast("long").alias("n_events"),
        )
        .orderBy("event_type")
    )


STREAM_BITMAP_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK SEMANTICS as an auditable batch replay: exactly which
    events a streaming job with ``withWatermark("ts", "2 minutes")``
    would DROP, and how late they were — the audit a pipeline runs
    before trusting its watermark delay. The testdata's events arrive
    in event-time order, so out-of-orderness is induced by a
    deterministic md5 network delay in [0, 300) s per event (the
    engine-independent hash_bucket convention); arrival then groups
    into 10-minute micro-batches, and Spark's actual watermark algebra
    is replayed exactly: wm(batch k) = max event-time seen in batches
    < k, minus the 2-minute delay; an event is dropped iff its
    event-time < wm of its arrival batch.

    Scale shape: the delay/batch assignment is map-only integer
    arithmetic on unix seconds; per-batch maxima aggregate
    distributed; the running-max window runs over ONE ROW PER
    MICRO-BATCH (time-bounded domain — ~52k rows/year at any corpus
    size); the watermark table broadcasts back onto events. All
    integer-exact → full DuckDB oracle."""
    from medical_examination_data_etl_system_spark.operators.curation import hash_bucket
    from medical_examination_data_etl_system_spark.queries import load
    from pyspark.sql import Window

    delay_s, batch_s, wm_delay_s = 300, 600, 120
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("et"),
    )
    arr = ev.withColumn(
        "batch",
        F.floor(
            (F.col("et") + hash_bucket(F.col("event_id"), delay_s)) / batch_s
        ),
    )
    bmax = arr.groupBy("batch").agg(F.max("et").alias("bmax"))
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    wm = bmax.select(
        "batch", (F.max("bmax").over(w) - wm_delay_s).alias("wm")
    )
    flagged = arr.join(F.broadcast(wm), "batch").select(
        "event_type",
        F.when(F.col("et") < F.col("wm"), F.lit(1)).otherwise(F.lit(0)).alias("late"),
        F.when(F.col("et") < F.col("wm"), F.col("wm") - F.col("et")).alias("late_by"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("late").alias("n_late"),
            F.round(F.sum("late") / F.count(F.lit(1)), 4).alias("late_share"),
            F.max("late_by").alias("max_late_s"),
        )
        .orderBy("event_type")
    )


WATERMARK_LATE_AUDIT_SQL = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS et
  FROM events
), arr AS (
  SELECT *,
         CAST(floor((et + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 300)) / 600.0) AS BIGINT) AS batch
  FROM e
), bmax AS (
  SELECT batch, max(et) AS bmax FROM arr GROUP BY batch
), wm AS (
  SELECT batch,
         max(bmax) OVER (ORDER BY batch ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 120 AS wm
  FROM bmax
), flagged AS (
  SELECT a.event_type,
         CASE WHEN a.et < w.wm THEN 1 ELSE 0 END AS late,
         CASE WHEN a.et < w.wm THEN w.wm - a.et END AS late_by
  FROM arr a JOIN wm w USING (batch)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late,
       round(CAST(sum(late) AS DOUBLE) / count(*), 4) AS late_share,
       CAST(max(late_by) AS BIGINT) AS max_late_s
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "events_watermark_late_audit": QueryDef(
        events_watermark_late_audit, WATERMARK_LATE_AUDIT_SQL
    ),
    "stream_bitmap_distinct_users": QueryDef(stream_bitmap_distinct_users, STREAM_BITMAP_SQL),
    "stream_tumbling_hourly": QueryDef(stream_tumbling_hourly, STREAM_TUMBLING_SQL),
    "stream_static_enrich": QueryDef(stream_static_enrich, STREAM_STATIC_SQL),
    "stream_sliding_halfhour": QueryDef(stream_sliding_halfhour, STREAM_SLIDING_SQL),
    "stream_session_builtin": QueryDef(stream_session_builtin, STREAM_SESSION_BUILTIN_SQL),
    "stream_sessionize_stateful": QueryDef(stream_sessionize_stateful, STREAM_SESSIONS_SQL),
    "stream_click_attribution": QueryDef(stream_click_attribution, STREAM_ATTRIBUTION_SQL),
    "stream_dedup_exactly_once": QueryDef(stream_dedup_exactly_once, STREAM_DEDUP_SQL),
    "stream_upsert_latest_state": QueryDef(stream_upsert_latest_state, STREAM_UPSERT_SQL),
    "stream_running_ewma": QueryDef(stream_running_ewma, STREAM_EWMA_SQL),
    "stream_cms_user_counts": QueryDef(stream_cms_user_counts, _CMS_ORACLE),
}
