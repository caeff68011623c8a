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


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-column locality without directories
# ---------------------------------------------------------------------------


def minmax_bucket(col, lo, hi, bits: int = 12):
    """Monotone map of ``col`` into integer buckets [0, 2^bits) by its
    [lo, hi] range (Column or literal bounds; a 1-row global min/max
    aggregate cross-joined broadcast keeps the whole thing lazy).
    Monotonicity is the property Z-order needs: range predicates on the
    source column stay range-shaped in bucket space."""
    from pyspark.sql import functions as F

    lo_c = lo if hasattr(lo, "cast") else F.lit(lo)
    hi_c = hi if hasattr(hi, "cast") else F.lit(hi)
    span = F.greatest(hi_c.cast("double") - lo_c.cast("double"), F.lit(1.0))
    scaled = F.floor(
        (col.cast("double") - lo_c.cast("double")) * ((1 << bits) - 1) / span
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit((1 << bits) - 1)), F.lit(0))


def zorder_value(bucket_cols, bits: int = 12):
    """Morton code: interleave the bits of k bucket columns (each in
    [0, 2^bits)) so lexicographic order on the result alternates
    locality across ALL dimensions. The expression is a static sum of
    shift/mask terms — pure codegen, no UDF; k·bits terms (≤ ~64)."""
    from pyspark.sql import functions as F

    k = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + j)
    return z


def write_zordered(df: DataFrame, path: str, zcol, n_files: int = 16, mode: str = "overwrite") -> None:
    """Cluster ``df`` by a Z-order value and write plain (unpartitioned)
    parquet: ``repartitionByRange`` on the Morton code splits the curve
    into ``n_files`` contiguous segments, ``sortWithinPartitions``
    tightens every file's row-group min/max stats on BOTH underlying
    dimensions. This is the Delta/Iceberg ``OPTIMIZE ZORDER BY`` role:
    unlike Hive partitioning (one coarse column, directory explosion),
    Z-order gives multi-dimensional skipping on the same flat files —
    a predicate box on (c1, c2) overlaps only the curve segments that
    cross it, so most files are skipped by footer stats alone.

    The range shuffle samples the z distribution, so file sizes stay
    balanced under ANY data skew — the property a modulo bucketing
    would lose."""
    staged = (
        df.withColumn("_zorder", zcol)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    staged.write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction (the Delta/Iceberg ``OPTIMIZE`` role):
    read a fragmented parquet dir, rewrite it as ⌈bytes/target⌉ files,
    return the file count written.

    Streaming upserts, per-trigger micro-batches, and over-parallel
    writes all strand thousands of KB-scale files; every subsequent
    scan then pays a task + footer read per file. Compaction is one
    ``coalesce`` write — coalesce, not repartition: no shuffle, each
    output file concatenates whole input splits. File count derives
    from the ACTUAL on-disk bytes (Hadoop listing), so the same call
    yields 128 MB-class files whether the input was 10 files or 10⁵.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
