"""Connected components — clusters from near-duplicate pairs.

Near-dup detection (MinHash/SimHash/cosine) yields PAIRS; deduplication
needs CLUSTERS (keep one representative per component). This is the
iterative min-label-propagation algorithm (the standard Spark shape for
GraphX-style CC without GraphX):

- each node starts labeled with itself;
- every round, each node takes the min label among itself and its
  neighbors (one join + one aggregation per round);
- converges in O(graph diameter) rounds — near-dup graphs are
  overwhelmingly small-diameter clusters, so a handful of rounds.

Scale posture: per-round cost is one shuffle of |edges| + |labels|;
``localCheckpoint`` truncates lineage each round so the plan does not
grow with iterations (a classic iterative-algorithm failure mode), and
convergence is detected with a per-round changed-count action.

Iterative + data-dependent round count → genuinely non-SQL-expressible
(driver records a rows-only check for queries built on this; unit tests
pin exact components on known graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id reachable through the pair graph."""
    spark = pairs.sparkSession
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    # Size the per-round shuffle to the graph, not the session default:
    # every round shuffles |edges|+|labels| rows, and an oversized
    # partition count charges fixed per-partition cost × rounds on a
    # sparse pair graph (near-dup graphs are far smaller than the corpus
    # that produced them). ~1M edges per partition, floor of 8.
    n_edges = edges.count()
    n_part = max(8, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                        n_edges // 1_000_000 + 1))
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint(eager=True)
        )

        # Labels are monotonically non-increasing, so the label sum is a
        # fixpoint detector: unchanged sum ⟺ converged. One scalar
        # aggregation per round instead of a join + count.
        prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
        for _ in range(max_iter):
            nbr_min = edges.join(labels, edges.dst == labels.node).select(
                F.col("src").alias("node"), F.col("comp")
            )
            labels = (
                labels.unionByName(nbr_min)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
    return labels


def dedup_by_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup dedup: drop every doc that is in a component but is not
    its minimum-id representative. Docs in no pair survive untouched."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
