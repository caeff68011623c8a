"""Skew-mitigation queries: the salted operators must produce results
identical to their naive forms — the oracles ARE the naive SQL.

The events table's event_type has low cardinality — exactly the shape
where, at 100 TB, a plain groupBy/countDistinct or a fact-dim join on a
hot key funnels through single tasks. Testdata itself is uniform; these
queries pin the rewrite's CORRECTNESS (bit-identical results), while
tests/test_plans.py pins its plan shape (two-shuffle agg, exploded dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from medical_examination_data_etl_system_spark.queries import QueryDef, load


def skew_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the two-phase salted rewrite."""
    events = load(spark, sf_dir, "events")
    return salted_count_distinct(
        events, ["event_type"], "user_id", num_salts=16, out_col="n_users"
    ).orderBy("event_type")


SALTED_COUNT_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join: events against a per-user cohort dim (too
    hot a key to trust one task at scale), then a cohort rollup. The
    salt must not change the join result — oracle is the plain join."""
    events = load(spark, sf_dir, "events")
    cohorts = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"))
        .withColumn("cohort", F.concat(F.lit("c"), (F.col("user_id") % 10).cast("string")))
    )
    joined = salted_join(events, cohorts, on=["user_id"], num_salts=8, how="inner")
    # Exact cents (q22/q9 pattern): cohort groups sum thousands of
    # doubles, where engine/partition summation order can flip
    # round(sum, 2) at a half-cent boundary.
    return (
        joined.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias("total_value"),
        )
        .orderBy("cohort")
    )


SALTED_JOIN_SQL = """
SELECT 'c' || CAST(user_id % 10 AS VARCHAR) AS cohort,
       count(*) AS n_events,
       sum(round(value * 100, 0)) / 100 AS total_value
FROM events
JOIN (SELECT c_custkey AS uid FROM customer) ON user_id = uid
GROUP BY cohort
ORDER BY cohort
"""


QUERIES = {
    "skew_salted_count_distinct": QueryDef(
        skew_salted_count_distinct, SALTED_COUNT_DISTINCT_SQL
    ),
    "skew_salted_join": QueryDef(skew_salted_join, SALTED_JOIN_SQL),
}
