"""CDC merge / SCD2 queries (operators/merge.py) in the driver battery.

Both change batches are DERIVED deterministically from the testdata
itself (no synthetic side files), so the DuckDB oracle reconstructs the
identical inputs and the comparison checks the MERGE semantics —
latest-wins sequencing, delete vs upsert routing, pass-through — not
the data generator. No float arithmetic is introduced anywhere:
updates rewrite a string column and money is compared as exact cents
(the q9 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators import merge
from medical_examination_data_etl_system_spark.queries import QueryDef, load


def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 CDC MERGE onto orders.

    Base = orders with key % 4 != 0. The change batch touches every
    even key: seq 1 rewrites the priority to ``X-UPDATED-1``; keys
    divisible by 6 also get a seq-2 change (``X-UPDATED-2``, or a
    DELETE when divisible by 5). So the merge exercises every MERGE
    path at once: update (even, %4!=0), insert (even, %4==0),
    latest-wins (seq 2 over seq 1), delete, and pass-through (odd
    keys). Post-merge state is summarized per priority with exact-cent
    sums.
    """
    orders = load(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 != 0)
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    c1 = even.withColumn("o_orderpriority", F.lit("X-UPDATED-1")).withColumn(
        "seq", F.lit(1)
    ).withColumn("op", F.lit("U"))
    c2 = (
        even.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_orderpriority", F.lit("X-UPDATED-2"))
        .withColumn("seq", F.lit(2))
        .withColumn(
            "op", F.when(F.col("o_orderkey") % 5 == 0, F.lit("D")).otherwise(F.lit("U"))
        )
    )
    merged = merge.apply_changes(
        base, c1.unionByName(c2), key_cols="o_orderkey", seq_col="seq", op_col="op"
    )
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


CDC_MERGE_SQL = """
WITH base AS (
  SELECT * FROM orders WHERE o_orderkey % 4 <> 0
), changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         'X-UPDATED-1' AS o_orderpriority, 1 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         'X-UPDATED-2' AS o_orderpriority, 2 AS seq,
         CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0
), latest AS (
  SELECT * FROM changes
  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1
), merged AS (
  SELECT b.* FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = b.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM latest WHERE op <> 'D'
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(o_orderkey) AS max_orderkey
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history of each user's event_type from the event log:
    consecutive same-type events collapse into one validity interval,
    closed by the next different-type event (open interval = current).
    Order is (ts, event_id) — event_id breaks same-timestamp ties so
    both engines fold runs identically."""
    events = load(spark, sf_dir, "events")
    hist = merge.scd2_intervals(
        events,
        key_cols="user_id",
        order_col=["ts", "event_id"],
        attr_cols=["event_type"],
        collapse=True,
    )
    return hist.orderBy("user_id", "valid_from", "event_type")


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), changed AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
FROM changed
ORDER BY user_id, valid_from, event_type
"""


def pit_purchase_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase labeled with the user's SCD2
    state (last non-purchase event type) valid AT the purchase
    timestamp — the no-future-leakage temporal join. History built by
    ``scd2_intervals`` over non-purchase events; the key equality keeps
    the plan a hash equi-join with interval containment as a post-join
    filter, never a nested loop. Purchases before a user's first state
    drop out (inner)."""
    events = load(spark, sf_dir, "events")
    history = merge.scd2_intervals(
        events.filter(F.col("event_type") != "purchase"),
        key_cols="user_id",
        order_col=["ts", "event_id"],
        attr_cols=["event_type"],
    ).select(
        "user_id", F.col("event_type").alias("user_state"), "valid_from", "valid_to"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    labeled = merge.point_in_time_join(purchases, history, "user_id", "ts")
    return (
        labeled.groupBy("user_state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .orderBy("user_state")
    )


PIT_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events WHERE event_type <> 'purchase'
), changed AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type IS DISTINCT FROM prev_type
), hist AS (
  SELECT user_id, event_type AS user_state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
  FROM changed
)
SELECT h.user_state,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(p.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events p
JOIN hist h
  ON p.user_id = h.user_id
 AND p.ts >= h.valid_from
 AND (h.valid_to IS NULL OR p.ts < h.valid_to)
WHERE p.event_type = 'purchase'
GROUP BY h.user_state
ORDER BY h.user_state
"""


def incr_agg_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a pre-aggregated base
    state (orders before 1999) is MERGED with a freshly-aggregated delta
    (1999-onward) by re-aggregating the union of partial states — the
    algebraic-merge property of (count, sum). At 100 TB the base state
    is key-cardinality-sized (never rescanned); each refresh scans only
    the delta — the pattern behind every incremental pipeline. The
    oracle recomputes from scratch over the full table, pinning
    merge == recompute.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = "1999-01-01"
    keys = ["o_orderstatus", "o_orderpriority"]
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("sum_cents"),
        )

    base_state = state(o.filter(F.col("o_orderdate") < cutoff))
    delta_state = state(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base_state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("sum_cents").alias("sum_cents"))
        .orderBy(*keys)
    )


INCR_AGG_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


def incr_join_merge_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join algebra
    that completes incr_agg_merge_orders' aggregate story:
    Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, so a refresh of the aggregated
    revenue view G(orders⋈lineitem) re-aggregates the stored base
    partials with THREE delta-sized join terms — never rescanning
    A₀⋈B₀ (here materialized once as the base state; at 100 TB it is
    the stored view). Both sides delta independently (orders by order
    date, lineitem by ship date), so every term is non-trivially
    exercised. The oracle joins from scratch, pinning
    maintain == recompute — the join twin of merge == recompute."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    cutoff = "1996-01-01"
    a0, da = o.filter(F.col("o_orderdate") < cutoff), o.filter(F.col("o_orderdate") >= cutoff)
    b0, db = li.filter(F.col("l_shipdate") < cutoff), li.filter(F.col("l_shipdate") >= cutoff)
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")

    def gstate(odf: DataFrame, ldf: DataFrame) -> DataFrame:
        return (
            odf.join(ldf, odf.o_orderkey == ldf.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"), F.sum(cents).alias("rev_cents"))
        )

    base = gstate(a0, b0)  # the stored view's partial state
    deltas = [gstate(da, b0), gstate(a0, db), gstate(da, db)]
    merged = base
    for d in deltas:
        merged = merged.unionByName(d)
    return (
        merged.groupBy("o_orderpriority")
        .agg(F.sum("n_lines").alias("n_lines"), F.sum("rev_cents").alias("rev_cents"))
        .orderBy("o_orderpriority")
    )


INCR_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "incr_join_merge_revenue": QueryDef(incr_join_merge_revenue, INCR_JOIN_SQL),
    "cdc_merge_orders": QueryDef(cdc_merge_orders, CDC_MERGE_SQL),
    "scd2_user_event_history": QueryDef(scd2_user_event_history, SCD2_SQL),
    "pit_purchase_user_state": QueryDef(pit_purchase_user_state, PIT_SQL),
    "incr_agg_merge_orders": QueryDef(incr_agg_merge_orders, INCR_AGG_SQL),
}
