"""Sketch-backed heavy hitters: partition-local Misra-Gries candidate
generation + exact distributed recount (SURVEY.md §2b X47).

Why not just ``groupBy(col).count().orderBy(...).limit(k)``? That
shuffles one partial-aggregate row per DISTINCT key. For vocabulary-
scale keys (word/n-gram frequencies over a 100 TB corpus — trillions of
distinct grams) the shuffle of the partial aggregates IS the bottleneck.
The sketch path shuffles only O(partitions × capacity) candidate values
— constant per partition — then recounts exactly with the candidate set
broadcast as a semi-join, so the big side stays map-only.

Guarantee (Misra-Gries + mergeable-summaries batch merge): after
processing N rows with ``capacity`` counters, every key with true
frequency > N/(capacity+1) is in the candidate set. Since the final
counts come from an exact recount, the ONLY approximation is candidate
completeness — pick ``capacity`` so N/(capacity+1) is below the k-th
frequency you care about (for Zipf-shaped data, capacity a few × k).
When ``capacity`` ≥ the number of distinct keys, the result is exact
unconditionally (counters never evict).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(state: Counter, batch: Counter, capacity: int) -> Counter:
    """Merge a batch into an MG summary (Agarwal et al., 'Mergeability
    of Summaries': combine counts, subtract the (capacity+1)-th largest,
    drop non-positives). Counter arithmetic is C-speed per batch — no
    per-row Python."""
    state.update(batch)
    if len(state) > capacity:
        # (capacity+1)-th largest count = eviction offset
        offset = sorted(state.values(), reverse=True)[capacity]
        state = Counter({k: c - offset for k, c in state.items() if c > offset})
    return state


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` via the
    sketch-then-verify pattern: ``(value, cnt, rnk)``, ties broken by
    value ascending (deterministic, oracle-matched).

    Plan: one Arrow-batched ``mapInPandas`` pass emits ≤ ``capacity``
    candidate values per partition (no shuffle of the raw keys), the
    tiny candidate union broadcasts back as a semi-join, and the exact
    recount aggregates only candidate rows. The 100 TB cost is one
    map-only scan + a broadcast-filtered count — vs a full
    distinct-key shuffle for the naive plan.
    """
    values = df.select(F.col(col).alias("v"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: Counter = Counter()
        for pdf in batches:
            state = _mg_merge(state, Counter(pdf["v"].dropna()), capacity)
        yield pd.DataFrame({"v": list(state.keys())})

    candidates = (
        values.mapInPandas(mg_partition, schema=values.schema)
        .distinct()
    )
    counted = (
        values.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("v"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("v").alias(col), "cnt", "rnk")
        .orderBy("rnk")
    )
