"""Data-layout sink: Hive-partitioned, sorted parquet for scan pruning.

The write-side half of the 100 TB read-path story: a coarse partition
column prunes whole DIRECTORIES before any I/O (Catalyst
``PartitionFilters``), and sorting within files tightens parquet
row-group min/max stats so predicates on the sort column skip pages
inside the files that survive (``PushedFilters``). Together they are
the free 100-1000× scan reduction every warehouse layout leans on —
the same role as Hive partitioning + clustering keys / Z-order.

Layout discipline encoded here:

- ``repartition(partition_cols)`` BEFORE ``write.partitionBy``:
  without it every write task holds a file open per partition value it
  sees (task_count × value_count small files — the classic partitioned
  -write mistake); with it each partition value lands in few tasks and
  file counts stay bounded by the shuffle partition count.
- ``sortWithinPartitions`` AFTER the repartition: a global ``orderBy``
  would add a second range shuffle; within-file ordering is what
  row-group stats need, total order is not.
- Partition column choice is the CALLER's contract: low cardinality
  (≤ thousands of directories), high selectivity in real predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``path/<col>=<value>/...`` parquet with bounded
    file counts and (optionally) sorted row groups."""
    staged = df.repartition(*partition_cols)
    if sort_cols:
        staged = staged.sortWithinPartitions(*partition_cols, *sort_cols)
    staged.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition-column predicates the caller
    adds prune directories (assert via ``PartitionFilters`` in the
    plan — guarded in tests/test_layout.py)."""
    return spark.read.parquet(path)
