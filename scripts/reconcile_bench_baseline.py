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
# (r09: itemCF re-enters at its capped/persisted plan; the three
# MinHash-kernel consumers re-enter at the posexplode-banding plan.
# docs_incremental_dedup's historical 4.15 s additionally proved
# unreproducible on BIT-IDENTICAL code — idle min-of-3 held 5.6-6.3 s
# across two sessions this round, as did the r7/r8 driver runs — so
# the fresh number is the honest floor even ignoring the plan change.)
CHANGED: set[str] = {
    "lineitem_itemcf_recommend",
    "docs_incremental_dedup",
    "docs_minhash_md5_exact",
    "docs_minhash_calibration",
}

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
improved = sum(1 for n in folded if folded[n] < fresh[n])
total = round(sum(folded.values()), 3)
json.dump(
    {"sf": cur["sf"], "total_sec": total, "queries": folded},
    open(path, "w"), indent=1, sort_keys=True,
)
print(f"reconciled: {len(folded)} queries, total {total}s "
      f"({improved} took a historical best; fresh total {cur['total_sec']}s)")
