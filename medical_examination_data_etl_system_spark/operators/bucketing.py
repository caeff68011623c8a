"""Bucketed (co-located) joins — the no-shuffle fact⋈fact answer.

At 100 TB the dominant join cost is the shuffle: both sides exchange on
the join key every query. Bucketing pays that shuffle ONCE at write
time — ``bucketBy(N, key)`` hash-partitions rows into N files per
partition and records the layout in the catalog — after which every
join/aggregation on the bucket key reads co-located buckets with NO
Exchange in the plan (asserted in tests/test_plans.py). This is the
standard warehouse layout for repeatedly-joined fact tables (orders ⋈
lineitem on orderkey here); broadcast handles small dims, bucketing
handles fact⋈fact.

Sizing note: N buckets shards each key's rows N ways per writing task's
output; pick N ≈ table_size / target_file_size at deployment scale and
keep it EQUAL on both sides (mismatched bucket counts reintroduce a
shuffle on one side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) on ``bucket_cols`` — sorted buckets let the sort-merge join
    skip its sort too."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def ensure_bucketed_order_tables(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8, database: str = "graft_buckets"
) -> tuple[str, str]:
    """Write orders/lineitem bucketed on the order key (idempotent
    overwrite; bucket counts MATCH by construction). Returns the two
    table names."""
    import shutil
    from urllib.parse import urlparse

    from medical_examination_data_etl_system_spark.queries import load

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    orders_t = f"{database}.orders_by_orderkey"
    lineitem_t = f"{database}.lineitem_by_orderkey"
    # Cross-session idempotence: the in-memory catalog restarts empty
    # while spark-warehouse persists on disk, so a leftover managed-table
    # location from a previous process blocks saveAsTable. Drop from the
    # catalog AND clear the physical location.
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (orders_t, lineitem_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        db, name = t.split(".")
        shutil.rmtree(f"{warehouse}/{db}.db/{name}", ignore_errors=True)
    write_bucketed(
        load(spark, sf_dir, "orders"), orders_t, ["o_orderkey"], num_buckets, ["o_orderkey"]
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem"), lineitem_t, ["l_orderkey"], num_buckets, ["l_orderkey"]
    )
    return orders_t, lineitem_t


def bucketed_join(spark: SparkSession, orders_t: str, lineitem_t: str) -> DataFrame:
    """orders ⋈ lineitem on the shared bucket key — zero-Exchange join
    when both catalogs carry matching bucket specs."""
    orders = spark.table(orders_t)
    li = spark.table(lineitem_t)
    return orders.join(li, orders.o_orderkey == li.l_orderkey)
