"""Render results/suite.jsonl into a per-instance strategy table (markdown).

    python scripts/summarize_suite.py [results/suite.jsonl]
"""

import json
import sys


def main(path="results/suite.jsonl"):
    rows = {}
    strategies = []
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "instance" not in r:
                continue
            rows.setdefault(r["instance"], {})[r["strategy"]] = r
            if r["strategy"] not in strategies:
                strategies.append(r["strategy"])

    print("| instance | gap (MC-SDP) | " + " | ".join(strategies) + " |")
    print("|---" * (len(strategies) + 2) + "|")
    sums = {s: [] for s in strategies}
    for name in sorted(rows):
        recs = rows[name]
        any_r = next(iter(recs.values()))
        gap = any_r["mccormick"] - any_r["sdp"]
        cells = []
        for s in strategies:
            if s in recs:
                v = recs[s]["final_gap_closed"]
                sums[s].append(v)
                cells.append(f"{100*v:.1f}%")
            else:
                cells.append("—")
        print(f"| {name} | {gap:.1f} | " + " | ".join(cells) + " |")
    means = [
        f"{100*sum(v)/len(v):.1f}% (n={len(v)})" if v else "—"
        for v in (sums[s] for s in strategies)
    ]
    print("| **mean** | | " + " | ".join(means) + " |")


if __name__ == "__main__":
    main(*sys.argv[1:])
