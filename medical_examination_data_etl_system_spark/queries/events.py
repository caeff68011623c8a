"""Event-time windows + JSON extraction over the events table
(SURVEY.md §2b X10, X11-json).

Batch mode here; medical_examination_data_etl_system_spark/streaming hosts the Structured
Streaming variants of the same aggregations (same semantics, watermarked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import QueryDef, load


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour wide, every 30 minutes — each event lands
    in exactly two windows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# An event at ts belongs to the two hour-wide windows starting at
# trunc30(ts) and trunc30(ts) - 30min — enumerate via a 2-row offset join.
SLIDING_SQL = """
SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offsets
GROUP BY 1
ORDER BY window_start
"""


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user: 15-minute inactivity gap.

    BOUNDARY (r12, found by exact-parity on the adversarial drain):
    Spark's ``session_window`` merge is END-INCLUSIVE — an event at
    EXACTLY last+gap still merges; a new session needs gap STRICTLY
    greater than 15 min. The oracle's lag/cumsum sessionization
    mirrors that with ``> INTERVAL '15 minutes'`` (a ``>=`` oracle
    hash-matched for 11 rounds only because the driver corpora have no
    exact-900.000000s gaps; the jittered 10M-event corpus has five).
    The CUSTOM sessionizer (streaming/events.py) keeps the opposite
    ``>=``-split convention, self-consistently with its own oracle.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_SQL = """
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


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction from the props column + aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each click attributed to the
    user's most recent view at or before it. Spark has no native as-of
    join — ``operators.asof`` composes it from union + carry-forward
    window (one shuffle on user_id)."""
    from medical_examination_data_etl_system_spark.operators.asof import asof_join_backward

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts", "value")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    return (
        asof_join_backward(clicks, views, ["user_id"], "ts", "ts")
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.col("right_event_id").alias("view_event_id"),
            F.col("right_ts").alias("view_ts"),
        )
        .orderBy("user_id", "event_id")
    )


ASOF_SQL = """
SELECT c.user_id AS user_id, c.event_id AS event_id, c.ts AS ts, c.value AS value,
       v.event_id AS view_event_id, v.ts AS view_ts
FROM (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY user_id, event_id
"""


def events_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join, BOTH directions: each purchase matched to
    the user's temporally closest click — before OR after — with ties
    at equal distance resolving to the earlier click. The
    feature-engineering join as-of can't express (backward-only misses
    a click seconds later), built by ``operators.asof.asof_join_nearest``
    from ONE user-keyed shuffle carrying both frame passes; the DuckDB
    oracle is an independent construction (dual inclusive ASOF JOIN +
    the same tie rule). Clicks pre-dedup to min event_id per (user, ts)
    — the operator's determinism precondition."""
    from pyspark.sql import Window as W

    from medical_examination_data_etl_system_spark.operators.asof import asof_join_nearest

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy("event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    joined = asof_join_nearest(purchases, clicks, ["user_id"], "ts", "ts")
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        F.col("right_event_id").alias("click_event_id"),
        F.col("right_ts").alias("click_ts"),
        (F.unix_micros("right_ts") - F.unix_micros("ts")).alias("gap_us"),
        F.when(F.unix_micros("right_ts") <= F.unix_micros("ts"), "backward")
        .otherwise("forward")
        .alias("direction"),
    ).orderBy("user_id", "event_id")


NEAREST_SQL = """
WITH p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
), dual AS (
  SELECT p.user_id, p.event_id, p.ts,
         b.event_id AS b_id, b.ts AS b_ts,
         f.event_id AS f_id, f.ts AS f_ts
  FROM p
  ASOF LEFT JOIN c b ON p.user_id = b.user_id AND p.ts >= b.ts
  ASOF LEFT JOIN c f ON p.user_id = f.user_id AND p.ts <= f.ts
), chosen AS (
  SELECT user_id, event_id, ts,
         CASE WHEN b_id IS NULL THEN f_id
              WHEN f_id IS NULL THEN b_id
              WHEN epoch_us(ts) - epoch_us(b_ts)
                   <= epoch_us(f_ts) - epoch_us(ts) THEN b_id
              ELSE f_id END AS click_event_id,
         CASE WHEN b_id IS NULL THEN f_ts
              WHEN f_id IS NULL THEN b_ts
              WHEN epoch_us(ts) - epoch_us(b_ts)
                   <= epoch_us(f_ts) - epoch_us(ts) THEN b_ts
              ELSE f_ts END AS click_ts
  FROM dual
  WHERE b_id IS NOT NULL OR f_id IS NOT NULL
)
SELECT user_id, event_id, ts, click_event_id, click_ts,
       epoch_us(click_ts) - epoch_us(ts) AS gap_us,
       CASE WHEN epoch_us(click_ts) <= epoch_us(ts)
            THEN 'backward' ELSE 'forward' END AS direction
FROM chosen
ORDER BY user_id, event_id
"""


QUERIES = {
    "events_tumbling_hourly": QueryDef(events_tumbling_hourly, TUMBLING_SQL),
    "events_nearest_event_join": QueryDef(events_nearest_event_join, NEAREST_SQL),
    "events_asof_attribution": QueryDef(events_asof_attribution, ASOF_SQL),
    "events_sliding_windows": QueryDef(events_sliding_windows, SLIDING_SQL),
    "events_session_windows": QueryDef(events_session_windows, SESSION_SQL),
    "events_json_extract": QueryDef(events_json_extract, JSON_SQL),
}
