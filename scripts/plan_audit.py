"""Battery-wide physical-plan audit: builds every query's executed
plan and flags the anti-patterns the 100 TB posture forbids —
row-at-a-time Python UDFs (BatchEvalPython) and unbounded cartesian
products — plus Exchange counts as a shuffle budget overview.

Arrow-batched boundaries (ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas) are the sanctioned Python path and are counted
separately, not flagged. BroadcastNestedLoopJoin over a 1-row bounds
frame (gap-fill spine, zorder bounds) is bounded work, reported but
not fatal.

Usage: python scripts/plan_audit.py [sf_dir] [name ...]
Exit code 1 if any query trips a fatal flag.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FATAL = ("BatchEvalPython", "CartesianProduct")
INFO = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "BroadcastNestedLoopJoin",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from medical_examination_data_etl_system_spark import get_spark
    from medical_examination_data_etl_system_spark.operators.cache import cache_scope
    from medical_examination_data_etl_system_spark.queries import all_queries

    spark = get_spark(app_name="plan-audit")
    qs = all_queries()
    names = sys.argv[2:] or list(qs)
    rc = 0
    for name in names:
        try:
            with cache_scope():
                plan = (
                    qs[name].fn(spark, sf_dir)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:120]}")
            rc = 1
            continue
        fatal = [f for f in FATAL if f in plan]
        info = [f for f in INFO if f in plan]
        n_ex = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
        status = "FATAL" if fatal else "ok"
        if fatal:
            rc = 1
        extras = (" " + ",".join(fatal + info)) if (fatal or info) else ""
        print(f"{status:5s} {name}: exchanges={n_ex}{extras}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
