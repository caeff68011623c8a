"""Misra-Gries heavy hitters (operators/sketch.py): candidate
guarantee under skew, exactness when capacity covers the key space,
and parity with a plain exact top-k."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.sketch import heavy_hitters


def _exact_topk(df, col, k):
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc(col))
    return (
        df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("rnk")
    )


def test_skewed_stream_small_capacity(spark):
    # Zipf-ish: value i has ~3000/i occurrences; tiny capacity (16)
    # still guarantees every key with freq > N/17 survives to recount.
    rng = random.Random(7)
    rows = []
    for i in range(1, 200):
        rows += [Row(v=f"k{i:03d}")] * (3000 // i)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows).repartition(8)
    got = [(r["v"], r["cnt"]) for r in heavy_hitters(df, "v", k=5, capacity=16).collect()]
    want = [(r["v"], r["cnt"]) for r in _exact_topk(df, "v", 5).collect()]
    assert got == want


def test_capacity_covers_keyspace_is_exact(spark):
    rows = [Row(v=f"x{i % 7}") for i in range(1000)]
    df = spark.createDataFrame(rows).repartition(4)
    got = [(r["v"], r["cnt"], r["rnk"]) for r in heavy_hitters(df, "v", k=7, capacity=64).collect()]
    want = [(r["v"], r["cnt"], r["rnk"]) for r in _exact_topk(df, "v", 7).collect()]
    assert got == want


def test_nulls_ignored(spark):
    df = spark.createDataFrame([Row(v="a"), Row(v=None), Row(v="a"), Row(v="b")])
    got = [(r["v"], r["cnt"]) for r in heavy_hitters(df, "v", k=2, capacity=8).collect()]
    assert got == [("a", 2), ("b", 1)]
