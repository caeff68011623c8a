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


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-order files keep tight min/max on BOTH dimensions: a 2-D
    predicate box skips most files by footer stats, while a 1-D sort
    on custkey leaves every file spanning the full date range."""
    import pyarrow.parquet as pq

    from medical_examination_data_etl_system_spark.operators.layout import (
        minmax_bucket,
        write_zordered,
        zorder_value,
    )

    orders = load(spark, SF_DIR, "orders")
    day = F.col("o_orderdate").cast("timestamp").cast("long")
    bounds = orders.agg(
        F.min("o_custkey").alias("ck_lo"), F.max("o_custkey").alias("ck_hi"),
        F.min(day).alias("d_lo"), F.max(day).alias("d_hi"),
    )
    staged = orders.crossJoin(F.broadcast(bounds))
    z = zorder_value([
        minmax_bucket(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")),
        minmax_bucket(day, F.col("d_lo"), F.col("d_hi")),
    ])
    zdir = f"{tmp_path}/orders_z"
    write_zordered(
        staged.withColumn("_zorder", z).select(*orders.columns, "_zorder"),
        zdir, F.col("_zorder"), n_files=16,
    )
    ldir = f"{tmp_path}/orders_linear"
    (orders.repartitionByRange(16, "o_custkey")
     .sortWithinPartitions("o_custkey").write.parquet(ldir))

    def file_ranges(d):
        out = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ck_i, od_i = cols["o_custkey"], cols["o_orderdate"]
            ck = [None, None]
            od = [None, None]
            for rg in range(md.num_row_groups):
                s_ck = md.row_group(rg).column(ck_i).statistics
                s_od = md.row_group(rg).column(od_i).statistics
                ck[0] = s_ck.min if ck[0] is None else min(ck[0], s_ck.min)
                ck[1] = s_ck.max if ck[1] is None else max(ck[1], s_ck.max)
                od[0] = s_od.min if od[0] is None else min(od[0], s_od.min)
                od[1] = s_od.max if od[1] is None else max(od[1], s_od.max)
            out.append((tuple(ck), tuple(od)))
        return out

    import datetime as dt

    box_ck = (100, 400)
    box_od = (dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1))

    def overlaps(r):
        (ck, od) = r
        return ck[0] <= box_ck[1] and ck[1] >= box_ck[0] and \
            od[0] <= box_od[1] and od[1] >= box_od[0]

    zfiles = file_ranges(zdir)
    lfiles = file_ranges(ldir)
    z_hit = sum(overlaps(r) for r in zfiles) / len(zfiles)
    l_hit = sum(overlaps(r) for r in lfiles) / len(lfiles)
    # the 2-D box must skip a real fraction of z files and never lose
    # to the 1-D layout (range-shuffle sampling can tie the file split
    # at this scale, so <= not <; the strict gap shows up as file
    # count grows)
    assert z_hit < 0.7, (z_hit, zfiles)
    assert z_hit <= l_hit, (z_hit, l_hit)


def test_compaction_collapses_file_count(spark, tmp_path):
    from medical_examination_data_etl_system_spark.operators.layout import compact_small_files

    orders = load(spark, SF_DIR, "orders")
    frag = f"{tmp_path}/frag"
    orders.repartition(100).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag == 100
    out = f"{tmp_path}/compacted"
    n = compact_small_files(spark, frag, out, target_file_bytes=1 << 20)
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == n and n_out < 5  # sf0.01 orders ≈ sub-MB total
    assert spark.read.parquet(out).count() == orders.count()
