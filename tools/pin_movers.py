#!/usr/bin/env python3
"""Sweep-over-sweep mover detection + the isolated-pin command (the r15
protocol, automated): compare two BENCH_TIMINGS artifacts, list every entry
whose median moved more than THRESHOLD (default 1.25x, either direction),
and print the exact isolated 5-rep Bench invocation that pins the slowed
set in the same round instead of reconciling it two rounds later.

Usage: python3 tools/pin_movers.py <prev_timings.json> <new_timings.json>
           [--threshold 1.25] [--min-abs-s 0.2]

Entries faster than --min-abs-s in BOTH sweeps are skipped: at that scale
the mover signal is job-setup jitter, not a plan change, and a pin would
measure the same jitter again.

Exit status: 0 when no slowdown movers, 1 when there are (so a round script
can gate on it).
"""
import argparse, json, sys


def medians(path):
    with open(path) as f:
        d = json.load(f)
    return {q: v["median_s"] for q, v in d["queries"].items()
            if v["median_s"] >= 0}, d.get("sf", "?")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--min-abs-s", type=float, default=0.2)
    args = ap.parse_args()

    prev, prev_sf = medians(args.prev)
    new, new_sf = medians(args.new)
    shared = sorted(set(prev) & set(new))
    slowed, sped = [], []
    for q in shared:
        a, b = prev[q], new[q]
        if max(a, b) < args.min_abs_s or a <= 0:
            continue
        r = b / a
        if r > args.threshold:
            slowed.append((q, a, b, r))
        elif r < 1.0 / args.threshold:
            sped.append((q, a, b, r))

    print(f"# {len(shared)} shared entries ({args.prev} [{prev_sf}] -> "
          f"{args.new} [{new_sf}]), threshold {args.threshold}x, "
          f"floor {args.min_abs_s}s")
    for tag, rows in (("SLOWED", slowed), ("SPED-UP", sped)):
        for q, a, b, r in sorted(rows, key=lambda t: -t[3] if tag == "SLOWED" else t[3]):
            print(f"{tag} {q}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    if slowed:
        names = ",".join(q for q, *_ in slowed)
        print("\n# isolated 5-rep pin (idle box; writes its own artifact):")
        print(f"SPARK_GRAFT_SF_DIR={new_sf} SPARK_GRAFT_BENCH_REPS=5 \\")
        print(f"  SPARK_GRAFT_BENCH_ONLY={names} \\")
        print("  SPARK_GRAFT_TIMINGS_OUT=/root/repo/SCALE_TIMINGS_pins_<round>.json \\")
        print("  tools/run_graft.sh graft.Bench")
    else:
        print("no slowdown movers — nothing to pin")
    return 1 if slowed else 0


if __name__ == "__main__":
    sys.exit(main())
