"""Product-analytics battery over the events table (SURVEY.md §2b
X43-X45): ordered funnel, cohort retention, gap-filled resampling.

All three carry full DuckDB oracles — the funnel's window cascade and
the resampler's generated spine are expressible in ANSI SQL, so the
driver value-hashes them end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.timeseries import (
    funnel_stages,
    resample_gap_fill,
    retention_cohorts,
)
from medical_examination_data_etl_system_spark.queries import QueryDef, load


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel (strictly-after semantics)."""
    ev = load(spark, sf_dir, "events")
    return funnel_stages(ev, ["view", "click", "purchase"])


# Mirrors the operator's window cascade: running min of each stage's
# valid timestamps over (user, ts, event_id), strict < against the
# previous stage's running first. Strict < makes the result invariant
# to tie order within a timestamp; event_id still pins the window
# order so both engines fold identically.
FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, ts, event_type, event_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f0
  FROM events
), s1 AS (
  SELECT *, CASE WHEN event_type = 'click' AND f0 < ts THEN ts END AS v1
  FROM s0
), s1m AS (
  SELECT *, min(v1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS f1
  FROM s1
), s2 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND f1 < ts THEN ts END AS v2
  FROM s1m
), per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS s0v,
         min(v1) AS s1v,
         min(v2) AS s2v
  FROM s2
  GROUP BY user_id
), counts AS (
  SELECT count(s0v) AS n0, count(s1v) AS n1, count(s2v) AS n2 FROM per_user
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'view' AS stage, n0 AS n_users,
         round(CAST(n0 AS DOUBLE) / n0, 4) AS pct_of_first FROM counts
  UNION ALL
  SELECT 1, 'click', n1, round(CAST(n1 AS DOUBLE) / n0, 4) FROM counts
  UNION ALL
  SELECT 2, 'purchase', n2, round(CAST(n2 AS DOUBLE) / n0, 4) FROM counts
)
ORDER BY stage_idx
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle, first week only."""
    ev = load(spark, sf_dir, "events")
    return retention_cohorts(ev, max_offset_days=7)


RETENTION_SQL = """
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_day f USING (user_id)
WHERE datediff('day', f.cohort_day, a.active_day) <= 7
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type resample over a generated dense spine with
    forward-filled sums."""
    ev = load(spark, sf_dir, "events")
    return resample_gap_fill(ev, key_col="event_type", step="1 hour")


GAP_FILL_SQL = """
WITH base AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS bucket_start, value AS v
  FROM events
), actual AS (
  SELECT k, bucket_start, count(*) AS n_events,
         round(sum(v), 2) AS sum_value
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_start) AS lo, max(bucket_start) AS hi FROM base
), spine AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
  FROM (SELECT DISTINCT k FROM base) CROSS JOIN bounds
)
SELECT s.k AS event_type, s.bucket_start,
       coalesce(a.n_events, 0) AS n_events,
       a.sum_value,
       last_value(a.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.k ORDER BY s.bucket_start
               ROWS UNBOUNDED PRECEDING) AS filled_sum,
       a.sum_value IS NULL AS was_gap
FROM spine s LEFT JOIN actual a USING (k, bucket_start)
ORDER BY event_type, bucket_start
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event (Markov) transition counts + row-normalized
    probabilities. One Exchange on user_id (the lead window), then a
    key-local count — the clickstream path-analysis shape.

    The lead is over (ts, event_id) so same-timestamp successors are
    engine-deterministic; terminal events (lead = null) are dropped,
    and probabilities are exact ratios of BIGINT counts rounded at 4.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wtot = Window.partitionBy("from_type")
    return (
        trans.withColumn("p", F.round(F.col("n") / F.sum("n").over(wtot), 4))
        .orderBy("from_type", "to_type")
    )


TRANSITION_SQL = """
WITH trans AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM trans WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM counts
ORDER BY from_type, to_type
"""


def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the co-purchase part graph (parts
    sharing an order are linked, both directions): top-20 parts.
    Edge build is one self-join on the order key — pair count per
    order is quadratic in order SIZE, which TPC-H bounds at 7 lines,
    so edges stay linear in lineitem. Iterative float folding →
    rows-only at the driver; values pinned vs NumPy in tests."""
    from pyspark.sql import Window

    from medical_examination_data_etl_system_spark.operators.clustering import pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, n_iter=10)
    w = Window.orderBy(F.desc("rank"), F.asc("node"))
    return (
        ranks.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(F.col("node").alias("l_partkey"), F.round("rank", 6).alias("rank"), "rnk")
        .orderBy("rnk")
    )


QUERIES = {
    "events_funnel_conversion": QueryDef(events_funnel_conversion, FUNNEL_SQL),
    "events_transition_matrix": QueryDef(events_transition_matrix, TRANSITION_SQL),
    "events_retention_cohorts": QueryDef(events_retention_cohorts, RETENTION_SQL),
    "events_gap_fill_hourly": QueryDef(events_gap_fill_hourly, GAP_FILL_SQL),
    "graph_pagerank_parts": QueryDef(graph_pagerank_parts, None),
}
