"""The oracle-checked query battery (SURVEY.md §2b; driver contract).

Every entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where expressible) an ANSI-SQL oracle that DuckDB runs on the same
parquet tables. Column names/aliases match exactly on both sides — the
driver's comparator sorts columns by name before value-hashing.

Registration pattern: each module exposes ``QUERIES: dict[name, QueryDef]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects — read it as raw nanos
    (legacy.parquet.nanosAsLong) and convert to a microsecond timestamp
    (lossless here: the generator emits microsecond-precision values).
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: epoch-nanos exceed double's 2^53 mantissa,
            # so float division here would round the microsecond.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, QueryDef]:
    from medical_examination_data_etl_system_spark.queries import (
        datapipe,
        events,
        functions,
        relational,
        skew,
        streaming,
        tpch,
        tpch2,
    )

    merged: dict[str, QueryDef] = {}
    for mod in (tpch, tpch2, relational, events, functions, datapipe, streaming, skew):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
