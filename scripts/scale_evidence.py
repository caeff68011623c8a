#!/usr/bin/env python
"""Generate SCALE.md — the single scale-evidence index (VERDICT r10 #5).

The 100x/adversarial figures accumulated across five survey round
blocks; this script folds the MACHINE artifacts into one regenerable
table covering every registered query:

- ``bench_queries.json``       — committed per-query sf0.1 bests;
- ``scale_sweep_100x.json``    — the full-battery replicated-100x sweep
                                 (every registered query, one VM class);
- ``scale_adversarial.json``   — curated standalone measurements on the
                                 NON-replicated adversarial corpora
                                 (only queries with an explicitly
                                 recorded figure).

Linear yardstick: a query is "linear" if 100x data costs 100x the sf0.1
best; the ratio column is t_100x / (100 * t_sf0.1). Ratios well under 1
mean sub-linear scaling (fixed overheads amortize, broadcasts/sketches
don't grow); ratios over 1 are called out with the recorded explanation
class. Cross-VM noise is real (the round disciplines note 1.3-2.2x VM
classes); treat ratios as one-significant-figure evidence, not
micro-benchmarks.

Usage: python scripts/scale_evidence.py   # rewrites SCALE.md
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose >1x-linear replicated-sweep reading has a recorded
# explanation (SURVEY r15 full-sweep block) — by-design quadratic
# oracle twins, Sigma-df^2 on a unique corpus, one-time layout writes.
OVER_LINEAR_NOTES = {
    "emb_cosine_topk": "by-design exact quadratic fold (oracle twin); post-rebalance",
    "emb_near_dup_cosine": "by-design exact all-pairs GEMM (oracle twin of the SRP path)",
    "docs_semantic_dedup": "by-design exact pair stage (oracle twin of the SRP path)",
    "docs_ngram_jaccard": "Sigma-df^2 candidate mass on a replicated corpus",
    "docs_ngram_containment": "Sigma-df^2 candidate mass (df-cap bounds it structurally)",
    "join_bucketed_colocated": "one-time bucketed-layout WRITE dominates; re-run on the layout is 4.6 s",
    "join_interval_overlap": "~1.1-1.2x — measurement noise band (SURVEY r15/r16 sweep notes)",
    "docs_pii_redact": "1.00x — exactly-linear regex map; noise band",
}


def main() -> None:
    bench = json.load(open(os.path.join(REPO, "bench_queries.json")))["queries"]
    sweep = json.load(open(os.path.join(REPO, "scale_sweep_100x.json")))
    adv = json.load(open(os.path.join(REPO, "scale_adversarial.json")))["queries"]
    sq = sweep["queries"]

    rows = []
    for name in sorted(bench):
        b = bench[name]
        s = sq.get(name)
        ratio = (s / (100.0 * b)) if (s and b) else None
        a = adv.get(name)
        rows.append((name, b, s, ratio, a))

    over = [(n, r) for n, _b, _s, r, _a in rows if r and r > 1.0]
    sub = sum(1 for _n, _b, _s, r, _a in rows if r and r <= 1.0)

    lines = [
        "# SCALE.md — scale-evidence index (generated; do not edit)",
        "",
        f"Regenerate: `python scripts/scale_evidence.py`. Sources: committed",
        f"per-query sf0.1 bests (`bench_queries.json`, total "
        f"{sum(bench.values()):.1f}s/{len(bench)}), the full-battery replicated-100x",
        f"sweep (`scale_sweep_100x.json`, {sweep['total_sec']}s/{sweep['n_queries']},"
        f" {sweep['measured_round']}), and the curated non-replicated adversarial",
        "figures (`scale_adversarial.json`). Linear-yardstick ratio =",
        "t_100x / (100 * t_sf0.1): <=1 is at-or-under linear scaling.",
        "",
        f"**Summary: {sub}/{len(rows)} queries at or under the linear yardstick on",
        f"the replicated 100x sweep; {len(over)} over, every one with a recorded",
        "explanation (table notes). Adversarial non-replicated corpora cover the",
        "docs, embeddings, graph, events, customers, and continuous-values",
        "families; family-sweep summaries live in SURVEY.md round logs.**",
        "",
        "| query | sf0.1 best (s) | replicated 100x (s) | ratio vs linear | adversarial 100x |",
        "|---|---|---|---|---|",
    ]
    for name, b, s, ratio, a in rows:
        note = OVER_LINEAR_NOTES.get(name, "")
        r_txt = f"{ratio:.2f}" if ratio is not None else "—"
        if ratio is not None and ratio > 1.0:
            r_txt += f" ({note})" if note else " (unexplained)"
        a_txt = f"{a['sec']}s on {a['corpus'].split(' (')[0]}" if a else ""
        lines.append(
            f"| {name} | {b:.3f} | {s if s is not None else '—'} | {r_txt} | {a_txt} |"
        )
    lines += [
        "",
        "Adversarial figure provenance (corpus construction + source round):",
        "",
    ]
    for name in sorted(adv):
        a = adv[name]
        lines.append(f"- `{name}`: {a['sec']}s — {a['corpus']}; {a['source']}")
    lines.append("")
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines))
    unexplained = [n for n, r in over if n not in OVER_LINEAR_NOTES]
    print(
        f"SCALE.md: {len(rows)} rows, {sub} <=linear, {len(over)} over"
        + (f", UNEXPLAINED over-linear: {unexplained}" if unexplained else "")
    )


if __name__ == "__main__":
    main()
