"""Render the QCQP suite + parity results into BASELINE.md's tables
(the sparse-path companion of summarize_suite.py / summarize_parity.py).

Suite rows (results/qcqp.jsonl): last row per (instance, strategy, k)
wins; gap-closed is recomputed against the LIVE registry
(data/qcqp/bounds.json) so denominator tightenings propagate.  Parity rows
(results/qcqp_parity.jsonl): grouped by (strategy, k), ratios far above 1
counted as divergent, mirroring summarize_parity.py.

    python scripts/summarize_qcqp.py
"""

import json
import os
import re
import sys
from collections import defaultdict

DIVERGENT_ABOVE = 1.5
_N_RE = re.compile(r"^qcqp(?:band)?(\d+)")


def main(suite="results/qcqp.jsonl", parity="results/qcqp_parity.jsonl",
         registry="data/qcqp/bounds.json"):
    reg = json.load(open(registry)) if os.path.exists(registry) else {}

    rows = {}
    if os.path.exists(suite):
        with open(suite) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "instance" not in r or "strategy" not in r:
                    continue
                e = reg.get(r["instance"])
                if e and "bounds" in r:
                    mc, sdp = e["mccormick"], e["sdp"]
                    denom = max(mc - sdp, 1e-12)
                    r["final_gap_closed"] = min(
                        1.0, max(0.0, (mc - r["bounds"][-1]) / denom))
                rows[(r["instance"], r["strategy"], r.get("k"))] = r

    by_cell = defaultdict(lambda: defaultdict(list))
    strategies = []
    for (name, strat, k), r in rows.items():
        m = _N_RE.match(name)
        if m is None or k is None:
            continue
        n = int(m.group(1))
        by_cell[(n, k)][strat].append(r["final_gap_closed"])
        if strat not in strategies:
            strategies.append(strat)

    if by_cell:
        print("## QCQP suite: mean gap closed by (n, k) "
              "(registry-validated denominators)\n")
        print("| n | k | " + " | ".join(strategies) + " |")
        print("|---|---|" + "---|" * len(strategies))
        for (n, k) in sorted(by_cell):
            cells = []
            for s in strategies:
                v = by_cell[(n, k)].get(s)
                cells.append(f"{100*sum(v)/len(v):.1f}% (n={len(v)})"
                             if v else "—")
            print(f"| {n} | {k} | " + " | ".join(cells) + " |")
        print()

    if os.path.exists(parity):
        groups = defaultdict(list)
        latest = {}
        with open(parity) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "instance" not in r or r.get("ratio") is None:
                    continue
                latest[(r["instance"], r["strategy"], r.get("k"),
                        r.get("rounds"))] = r
        for r in latest.values():
            groups[(r["strategy"], r.get("k"))].append(r["ratio"])
        print("## QCQP parity vs CPU replica (latest row per cell)\n")
        print("| strategy | k | cells | ratio (min / mean / max) | "
              ">= 0.95 | divergent |")
        print("|---|---|---|---|---|---|")
        for (s, k), ratios in sorted(groups.items()):
            ok = sum(1 for x in ratios if 0.95 <= x <= DIVERGENT_ABOVE)
            div = sum(1 for x in ratios if x > DIVERGENT_ABOVE)
            print(f"| {s} | {k} | {len(ratios)} | "
                  f"{min(ratios):.3f} / {sum(ratios)/len(ratios):.3f} / "
                  f"{max(ratios):.3f} | {ok}/{len(ratios)} | {div} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
