#!/usr/bin/env python
"""Fast inner-loop parity check: run named queries against their DuckDB
oracles at a given sf dir (default sf0.01), mirroring the driver's
compare (columns sorted by name, rows sorted, exact values).

Usage: python scripts/parity_one.py q1 q2 ... [--sf /root/testdata/sf0.01]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from medical_examination_data_etl_system_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Exactly the local gate's comparator — anything stricter or looser
# here would disagree with what pytest (and the driver) accept.
from tests.test_oracle_parity import _assert_frames_equal  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(app_name="parity-one")
    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata tables are single files; Spark-written corpora
        # (the adversarial dirs) are part-file DIRECTORIES — glob those.
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    failed = []
    for name in args:
        sdf = queries[name](spark, sf).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only, spark_rows={len(sdf)}")
            continue
        ddf = con.execute(oracles[name]).df()
        try:
            _assert_frames_equal(sdf, ddf, name)
            print(f"{name}: OK ({len(sdf)} rows)")
        except AssertionError as ex:
            failed.append(name)
            print(f"{name}: FAIL — {str(ex)[:1500]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
