"""Reconcile bench_queries.json to per-query best-observed mins
(VERDICT r6 #5 discipline): after a fresh idle min-of-N `python
bench.py` run has overwritten bench_queries.json, fold in each query's
best value across the named historical snapshots — EXCEPT queries whose
code changed this round (listed below), which keep the fresh
measurement (a conscious plan change must re-enter at its new cost,
not inherit the old plan's number).

Usage: python scripts/reconcile_bench_baseline.py <hist_rev> [...]
(each rev is a git revision whose bench_queries.json to fold in).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Queries whose physical plan changed this round: fresh value only.
# (r11 late-session: the value-domain percentile family re-enters on
# the adaptive-prefix plans — at sf0.1 the fact-rowcount hint keeps the
# plain windows, so fresh ≈ old modulo micro-deltas (MAD's total moved
# from a window to an agg+crossJoin; equi-depth's exclusive window
# became cum − cnt) — and the two SRP consumers re-enter on the
# bucket-packed kernel layout.)
#
# graph_triangle_stats provenance (VERDICT r10 watch item): the
# packed-adjacency rewrite landed at b9db81a and re-entered fresh at
# 5.756 under the CHANGED discipline; the committed best 4.794 first
# appears at 9f60eec, a LATER full pass on the same packed plan (every
# hist rev folded there — 5.756 @ b9db81a, 5.678 @ f2e0d8f — already
# postdated the rewrite, and no pre-change rev carries 4.794). The
# best therefore postdates the rewrite and stands.
CHANGED: set[str] = {
    "agg_percentiles_by_flag",
    "lineitem_winsorize_prices",
    "orders_price_mad",
    "events_histogram_equidepth",
    "events_conversion_latency",
    "orders_mann_whitney",
    "emb_near_dup_srp",
    "docs_semantic_dedup_srp",
    # exact GEMM twins: broadcast-vectors path active at sf0.1 too
    "emb_near_dup_cosine",
    "docs_semantic_dedup",
    # late-round: exclusive-running-min routed through the adaptive
    # prefix (small branch identical at sf0.1; measured faster on the
    # values corpus)
    "lineitem_skyline_frontier",
    "lineitem_weighted_median",
    "agg_p90_outlier_orders",
}

# Idle min-of-3 for plan-changed queries measured outside the last full
# pass (the full pass predated the change): folded as fresh values.
CHANGED_IDLE: dict[str, float] = {}

# Idle re-measurements made OUTSIDE a full bench pass, folded as an
# extra snapshot. (The r9 entries — pipeline_render_reports 1.80,
# emb_matryoshka_recall 1.77, emb_near_dup_cosine 1.51 — are already
# folded into the 97fb21b baseline and need not be repeated.)
IDLE_REMEASURED: dict[str, float] = {}

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(repo, "bench_queries.json")
cur = json.load(open(path))
fresh = cur["queries"]
folded = dict(fresh)
for rev in sys.argv[1:]:
    out = subprocess.run(
        ["git", "-C", repo, "show", f"{rev}:bench_queries.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    hist = json.loads(out)
    if str(hist.get("sf")) != str(cur.get("sf")):
        raise SystemExit(f"{rev}: sf {hist.get('sf')} != {cur.get('sf')}")
    for name, v in hist["queries"].items():
        if name in folded and name not in CHANGED:
            folded[name] = min(folded[name], float(v))
for name, v in IDLE_REMEASURED.items():
    if name in folded and name not in CHANGED:
        folded[name] = min(folded[name], v)
for name, v in CHANGED_IDLE.items():
    if name in folded:
        folded[name] = v
improved = sum(1 for n in folded if folded[n] < fresh[n])
total = round(sum(folded.values()), 3)
json.dump(
    {"sf": cur["sf"], "total_sec": total, "queries": folded},
    open(path, "w"), indent=1, sort_keys=True,
)
print(f"reconciled: {len(folded)} queries, total {total}s "
      f"({improved} took a historical best; fresh total {cur['total_sec']}s)")
