#!/usr/bin/env python3
"""Scaling-curve report: reads graft.Bench JSON outputs at several scale
factors and prints a per-query table with scaling slopes.

slope(a->b) = (t_b / t_a) / (sf_b / sf_a): 1.0 = perfectly linear in
data volume, << 1 = floor-bound (fixed overhead dominates), > 1 =
super-linear (a plan that will not survive a 100x scale-up).

Usage: scaling_report.py sf:path.json [sf:path.json ...]
"""
import json, sys


def main(specs):
    runs = []  # (sf, {query: sec})
    for spec in specs:
        sf, path = spec.split(":", 1)
        with open(path) as f:
            d = json.load(f)
        runs.append((float(sf), d["queries"], d["value"]))
    runs.sort()
    names = sorted(runs[0][1])
    sfs = [sf for sf, _, _ in runs]
    header = ["query"] + [f"sf{sf:g}" for sf in sfs]
    for a, b in zip(sfs, sfs[1:]):
        header.append(f"x{b/a:g}slope")
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    worst = []
    for n in names:
        ts = [q.get(n, float("nan")) for _, q, _ in runs]
        row = [n] + [f"{t:.2f}" for t in ts]
        slopes = []
        for (a, ta), (b, tb) in zip(zip(sfs, ts), zip(sfs[1:], ts[1:])):
            s = (tb / ta) / (b / a) if ta and ta > 0 else float("nan")
            slopes.append(s)
            row.append(f"{s:.2f}")
        print("| " + " | ".join(row) + " |")
        if slopes:  # single-run invocation: table only, no slope ranking
            worst.append((max(slopes), n, slopes))
    print()
    totals = [t for _, _, t in runs]
    print("| TOTAL | " + " | ".join(f"{t:.1f}" for t in totals) + " | " +
          " | ".join(f"{(tb/ta)/(b/a):.2f}" for (a, ta), (b, tb)
                     in zip(zip(sfs, totals), zip(sfs[1:], totals[1:]))) + " |")
    print()
    print("steepest end-segment slopes:")
    for s, n, slopes in sorted(worst, reverse=True)[:8]:
        print(f"  {n}: " + ", ".join(f"{x:.2f}" for x in slopes))


if __name__ == "__main__":
    main(sys.argv[1:])
