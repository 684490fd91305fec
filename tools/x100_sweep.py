#!/usr/bin/env python3
"""Fresh-JVM x100 sweep driver (r15 verdict ask #1).

Runs each named query as its own JVM (one Bench rep per process, 64 GB
heap, -Xlog:gc), rep-major across queries so a contention window perturbs
one rep of many queries rather than all reps of one. Aggregates per-query
rep times, spread, GC pause seconds, canary ceilings, and the x100/sf0.1
work ratio against a baseline BENCH_TIMINGS artifact.

The protocol mirrors SCALE_TIMINGS_x100fresh_r13.json ("fresh JVM per rep,
64g heap, -Xlog:gc") so r16 vectors are comparable to r13/r15 anchors.

Usage:
  tools/x100_sweep.py --queries q269_deep_recursion,q253_stream_upsert \
      --sf-dir /tmp/graft-sf10 --reps 3 --heap 64g \
      --baseline BENCH_TIMINGS_r15.json --out SCALE_TIMINGS_x100_r16.json

A per-rep wall timeout (default 30 min) turns a runaway scale cliff into a
recorded "timeout" rep instead of a wedged sweep (the same lesson as the
r15 oracle watchdog). Timeout/OOM/failed reps record -1.0.
"""
import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(query, sf_dir, heap, gc_log, timeout_s):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": query,
        "SPARK_GRAFT_BENCH_REPS": "1",
        "SPARK_GRAFT_TIMINGS_OUT": "none",
        "SPARK_DRIVER_MEM": heap,
        "SPARK_GRAFT_JAVA_OPTS": f"-Xlog:gc:file={gc_log}",
    })
    cmd = [os.path.join(REPO, "tools", "run_graft.sh"), "graft.Bench"]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, cwd=REPO, timeout=timeout_s,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return {"t": -1.0, "err": f"timeout>{timeout_s}s", "wall": time.time() - t0}
    wall = time.time() - t0
    line = next((l for l in reversed(proc.stdout.splitlines())
                 if l.startswith('{"metric"')), None)
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return {"t": -1.0, "err": f"rc={proc.returncode} " + " | ".join(tail)[:300],
                "wall": wall}
    d = json.loads(line)
    t = d["queries"].get(query, -1.0)
    # a scale guard firing is the operator refusing an SF by contract —
    # Bench reports those apart from failures, and so do we (r17 verdict #5).
    # Only coerce the time when the reported median is itself the -1.0
    # sentinel: with SPARK_GRAFT_BENCH_REPS > 1 a query can trip on one rep
    # and still report a valid median from the healthy reps, and that
    # measurement must not be silently discarded (r18 ADVICE)
    if query in (d.get("guard_trips") or []) and t < 0:
        return {"t": -1.0, "wall": wall, "canary_med": d.get("canary_med"),
                "canary_max": d.get("canary_max"), "tainted": d.get("tainted_reps", 0),
                "err": "guard_trip"}
    return {"t": t, "wall": wall, "canary_med": d.get("canary_med"),
            "canary_max": d.get("canary_max"), "tainted": d.get("tainted_reps", 0),
            "err": None if t >= 0 else "query failed (see bench stderr)"}


def gc_pause_seconds(gc_log):
    """Sum Pause line durations from a -Xlog:gc file (ms -> s)."""
    if not os.path.exists(gc_log):
        return None
    total_ms = 0.0
    pat = re.compile(r"Pause[^\n]*?([0-9]+\.[0-9]+)ms")
    with open(gc_log, errors="replace") as f:
        for line in f:
            m = pat.search(line)
            if m:
                total_ms += float(m.group(1))
    return round(total_ms / 1000.0, 1)


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated SparkEntry query names")
    ap.add_argument("--sf-dir", default="/tmp/graft-sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--heap", default="64g")
    ap.add_argument("--timeout-s", type=int, default=1800)
    ap.add_argument("--baseline", default=None,
                    help="BENCH_TIMINGS_*.json with sf0.1 medians for ratios")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gc-dir", default="/tmp/x100_gc")
    args = ap.parse_args()

    queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    os.makedirs(args.gc_dir, exist_ok=True)

    base = {}
    if args.baseline:
        with open(os.path.join(REPO, args.baseline)) as f:
            # a failed baseline entry (median_s=-1.0) would yield a silent
            # negative ratio that can never trip the >100 gate — drop it,
            # LOUDLY: a dropped baseline means the ratio gate cannot apply
            # to that query, and the reader must know, not infer
            raw = json.load(f)["queries"]
        base = {k: v["median_s"] for k, v in raw.items() if v["median_s"] > 0}
        dropped = sorted(k for k, v in raw.items() if v["median_s"] <= 0)
        if dropped:
            print(f"[x100] baseline medians unusable (<=0), ratio gate will not "
                  f"apply to: {', '.join(dropped)}", flush=True)

    results = {q: [] for q in queries}
    for rep in range(1, args.reps + 1):
        for q in queries:
            gc_log = os.path.join(args.gc_dir, f"{q}_rep{rep}.gclog")
            print(f"[x100] {q} rep {rep}/{args.reps} ...", flush=True)
            r = run_one(q, args.sf_dir, args.heap, gc_log, args.timeout_s)
            r["gc_pause_s"] = gc_pause_seconds(gc_log)
            results[q].append(r)
            stat = (f"{r['t']:.1f}s" if r["t"] >= 0
                    else "GUARD TRIP (designed)" if r["err"] == "guard_trip"
                    else f"FAILED ({r['err']})")
            print(f"[x100]   -> {stat} wall={r['wall']:.0f}s "
                  f"gc={r['gc_pause_s']}s canary_max={r.get('canary_max')}",
                  flush=True)

    out = {"sf": args.sf_dir,
           "protocol": (f"fresh JVM per rep (one Bench rep per JVM), {args.heap} heap, "
                        f"-Xlog:gc, rep-major interleave, {args.timeout_s}s watchdog"),
           "baseline": args.baseline, "queries": {}}
    for q in queries:
        reps = results[q]
        ok = [r["t"] for r in reps if r["t"] >= 0]
        entry = {
            "reps_s": [round(r["t"], 3) for r in reps],
            "median_s": round(median(ok), 3) if ok else -1.0,
            "spread": round(max(ok) / min(ok), 2) if len(ok) > 1 and min(ok) > 0 else None,
            "gc_pause_s": [r["gc_pause_s"] for r in reps],
            "canary_max": max((r.get("canary_max") or 0) for r in reps),
            "errors": [r["err"] for r in reps if r["err"]],
        }
        if q in base and ok:
            entry["sf01_median_s"] = base[q]
            entry["x_vs_sf01"] = round(entry["median_s"] / base[q], 1)
        out["queries"][q] = entry

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"[x100] wrote {args.out}")

    ranked = sorted((v.get("x_vs_sf01", 0), k) for k, v in out["queries"].items())
    print(f"{'query':34s} {'sf0.1':>8s} {'x100':>9s} {'ratio':>7s}")
    for ratio, q in reversed(ranked):
        v = out["queries"][q]
        print(f"{q:34s} {v.get('sf01_median_s', float('nan')):8.2f} "
              f"{v['median_s']:9.2f} {ratio:6.1f}x")
    # Exit codes: 0 = clean; 1 = confirmed super-proportional evidence
    # (ratio > 100, or zero successful reps NOT explained by a guard);
    # 3 = warnings only (partial failures with healthy medians, or queries
    # the ratio gate could not cover) — distinct so one transient harness
    # timeout cannot masquerade as a scale cliff (r17 ADVICE).
    rc = 0
    bad = [q for r, q in ranked if r > 100]
    if bad:
        print(f"[x100] SUPER-PROPORTIONAL (>100x on 100x work): {', '.join(bad)}")
        rc = 1
    # a guard trip is the operator refusing the SF BY DESIGN — report it as
    # its own class (the fail-loud contract working), never as a failure
    tripped = [q for q, v in out["queries"].items()
               if v["median_s"] < 0 and v["errors"]
               and all(e == "guard_trip" for e in v["errors"])]
    if tripped:
        print(f"[x100] DESIGNED GUARD TRIPS (operator refused this SF by "
              f"contract — pass): {', '.join(tripped)}")
    # a wedged/failed rep is STRONGER super-proportional evidence than a
    # measured ratio (a 1800s timeout at x100 is >870x on most entries)
    dead = [q for q, v in out["queries"].items()
            if v["median_s"] < 0 and q not in tripped]
    erred = [q for q, v in out["queries"].items()
             if v["errors"] and q not in dead and q not in tripped]
    noratio = [q for q, v in out["queries"].items()
               if base and v["median_s"] >= 0 and "x_vs_sf01" not in v]
    if dead:
        print(f"[x100] ZERO SUCCESSFUL REPS (treat as super-proportional): {', '.join(dead)}")
        rc = 1
    if erred:
        print(f"[x100] PARTIAL FAILURES with healthy medians (timeout/error reps): "
              f"{', '.join(erred)}")
        rc = rc or 3
    if noratio:
        print(f"[x100] RAN AT x100 BUT NO BASELINE RATIO (gate not applied): "
              f"{', '.join(noratio)}")
        rc = rc or 3
    return rc


if __name__ == "__main__":
    signal.signal(signal.SIGINT, signal.SIG_DFL)
    sys.exit(main())
