#!/usr/bin/env python3
"""Render the SCALE.md ratio table from two Bench timing artifacts.

Usage: python3 tools/scale_table.py SCALE_TIMINGS_sf01_rNN.json SCALE_TIMINGS_x10_rNN.json

Prints a markdown table (query | sf0.1 s | x10 s | ratio) sorted by ratio
descending, plus summary lines (totals, medians, failures) — the round's
scale-evidence table for SCALE.md.
"""
import json
import statistics
import sys


def main(sf01_path, x10_path):
    a = json.load(open(sf01_path))
    b = json.load(open(x10_path))
    qa = {k: v["median_s"] for k, v in a["queries"].items()}
    qb = {k: v["median_s"] for k, v in b["queries"].items()}
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        if qa[q] <= 0 or qb[q] <= 0:
            rows.append((q, qa[q], qb[q], None))
        else:
            rows.append((q, qa[q], qb[q], qb[q] / qa[q]))
    ok = [r for r in rows if r[3] is not None]
    ok.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | ×10 s | ratio |")
    print("|---|---|---|---|")
    for q, t1, t2, r in ok:
        print(f"| {q} | {t1:.2f} | {t2:.2f} | {r:.2f}× |")
    fails = [r[0] for r in rows if r[3] is None]
    t1 = sum(r[1] for r in ok)
    t2 = sum(r[2] for r in ok)
    med = statistics.median(r[3] for r in ok)
    print()
    print(f"queries: {len(ok)}; failed: {fails or 'none'}")
    print(f"total sf0.1 = {t1:.1f} s -> x10 = {t2:.1f} s (wall ratio {t2 / t1:.2f}x)")
    print(f"median per-query ratio: {med:.2f}x; >3x: "
          + ", ".join(f"{q} {r:.1f}x" for q, _, _, r in ok if r > 3))
    print(f"canaries: sf0.1 med/max {a['canary_med']}/{a['canary_max']} "
          f"tainted {a['tainted_reps']} retried {a['retried_reps']}; "
          f"x10 med/max {b['canary_med']}/{b['canary_max']} "
          f"tainted {b['tainted_reps']} retried {b['retried_reps']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
