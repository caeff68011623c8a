"""Partitioned-layout sink (operators/layout.py): directory pruning,
pushdown into surviving files, bounded file counts, and value fidelity.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.layout import read_pruned, write_partitioned
from medical_examination_data_etl_system_spark.queries import load

SF_DIR = "/root/testdata/sf0.01"


def _formatted(df) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


def test_partitioned_write_prunes_and_pushes_down(spark, tmp_path):
    out = f"{tmp_path}/orders_by_priority"
    orders = load(spark, SF_DIR, "orders")
    write_partitioned(
        orders, out, partition_cols=["o_orderpriority"], sort_cols=["o_orderdate"]
    )

    # one directory per priority value, Hive-style
    dirs = [e for e in os.listdir(out) if e.startswith("o_orderpriority=")]
    assert len(dirs) == orders.select("o_orderpriority").distinct().count()

    back = read_pruned(spark, out)
    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT").filter(
        F.col("o_orderdate") >= "1996-01-01"
    )
    plan = _formatted(pruned)
    # partition predicate prunes directories BEFORE I/O...
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan.replace("#", "")
    # ...and the date predicate reaches the parquet reader for the rest
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan

    # values round-trip exactly (partition col restored from dir names)
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.unionByName(
        back.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") < "1996-01-01")
        )
    ).count() == want


def test_partitioned_write_bounds_file_counts(spark, tmp_path):
    """repartition-before-partitionBy: each partition directory holds a
    handful of files, not one per upstream task."""
    out = f"{tmp_path}/orders_files"
    orders = load(spark, SF_DIR, "orders").repartition(16)  # simulate many tasks
    write_partitioned(orders, out, partition_cols=["o_orderstatus"])
    for d in os.listdir(out):
        if not d.startswith("o_orderstatus="):
            continue
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        assert len(files) <= 4, f"{d}: {len(files)} files (small-file explosion)"
