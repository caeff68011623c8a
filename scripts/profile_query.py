#!/usr/bin/env python
"""Optimization-round inner loop: for each named query, capture
`.explain("formatted")` into plans/<tag>/<name>_<suffix>.txt and time
N noop-sink executions (same methodology as bench.py: cache_scope per
run, min reported).

Usage:
  python scripts/profile_query.py [--sf DIR] [--tag r13] [--suffix before]
                                  [--reps 3] [--no-plan] name [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_examination_data_etl_system_spark import get_spark  # noqa: E402
from medical_examination_data_etl_system_spark.operators.cache import cache_scope  # noqa: E402
from medical_examination_data_etl_system_spark.queries import all_queries  # noqa: E402


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str | None) -> str | None:
        if name in args:
            i = args.index(name)
            if i + 1 >= len(args):
                raise SystemExit(f"{name} needs a value")
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    tag = opt("--tag", "r13")
    suffix = opt("--suffix", "before")
    reps = int(opt("--reps", "3"))
    no_plan = "--no-plan" in args
    if no_plan:
        args.remove("--no-plan")

    qs = all_queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        raise SystemExit(
            f"unknown queries: {unknown}; valid names are all_queries() keys "
            f"(e.g. {sorted(qs)[:3]} ...)"
        )
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", tag)
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="profile-query")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm-up

    for name in args:
        qd = qs[name]
        if not no_plan:
            with cache_scope():
                df = qd.fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            with cache_scope():
                df = qd.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min {min(times):.3f}s  runs {[round(t,3) for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
