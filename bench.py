#!/usr/bin/env python
"""Benchmark harness: runs the query battery at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query executes to completion through the noop sink (full plan
runs, no driver-side materialization cost). One warm-up of a trivial
action absorbs session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_examination_data_etl_system_spark import get_spark  # noqa: E402
from medical_examination_data_etl_system_spark.queries import all_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="medical_examination_data_etl_system_spark-bench")

    # warm-up: JVM + parquet footer caches
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, qd in sorted(all_queries().items()):
        t0 = time.perf_counter()
        df = qd.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Per-query isolation: several operators persist() intermediates
        # (LSH signatures, n-gram frames) as a real pipeline would; drop
        # them between queries so one query's cache residue doesn't skew
        # the next query's measurement.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_battery_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
