#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare — REPR-STRICT.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]

The optional third argument restricts the compare to a comma-separated
subset of query names — used to chunk the sf0.1 sweep (whose all-pairs
oracles run for tens of minutes) into independently schedulable pieces.

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views of the sf parquet tables, load the Spark parquet dump, sort columns by
name, canonicalize every value to a string, and compare exactly. This mirrors
the driver's hash compare: any representation difference (decimal scale,
int vs float, timestamp precision) is a FAIL here too, so local green
predicts driver green.
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd
import numpy as np

# Per-query watchdog: a DuckDB query that runs past this is interrupted and
# recorded as a FAIL instead of wedging the whole sweep (a stuck all-pairs
# oracle blocked two consecutive bench windows before this existed). The
# slowest legitimate sf0.1 oracle finishes well under this.
QUERY_TIMEOUT_S = int(os.environ.get("ORACLE_QUERY_TIMEOUT_S", "300"))

# progress must be visible while a long sweep runs (stdout is usually piped)
import functools
print = functools.partial(print, flush=True)


def canon(v):
    """Canonical string for a single value, independent of container dtype."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if np.isnan(v):
            return "<null>"
        return repr(v)  # repr is bit-faithful for float64
    if isinstance(v, (np.floating,)):
        if np.isnan(v):
            return "<null>"
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        # canonical µs-precision rendering regardless of storage precision
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if v is pd.NaT:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v}"


def canon_frame(df: pd.DataFrame):
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            col = col.astype("datetime64[us]")
        out[c] = [canon(v) for v in col.tolist()]
    return list(df.columns), out, len(df)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        missing = wanted - set(oracles)
        if missing:
            # a typo'd subset must FAIL, not exit green with zero checks run
            print(f"FAIL: no oracle for {sorted(missing)}")
            return 1
        oracles = {q: sql for q, sql in oracles.items() if q in wanted}
        if not oracles:
            print("FAIL: empty query subset")
            return 1
    n_pass = n_fail = 0
    for q in sorted(oracles):
        spark_dir = os.path.join(out_dir, q)
        try:
            got = pd.read_parquet(spark_dir)
            # Each oracle runs on its own cursor (a child connection sharing
            # the in-memory catalog), and the watchdog interrupts THAT
            # cursor: if the timer fires in the race window after fetchdf()
            # returns but before cancel(), the stale interrupt lands on a
            # cursor this query owns (closed below), never on the shared
            # connection where it would spuriously cancel the NEXT query.
            cur = con.cursor()
            done = threading.Event()

            def interrupt_cur():
                if not done.is_set():
                    try:
                        cur.interrupt()
                    except Exception:
                        pass  # cursor already closed: nothing to cancel

            watchdog = threading.Timer(QUERY_TIMEOUT_S, interrupt_cur)
            watchdog.start()
            try:
                want = cur.execute(oracles[q]).fetchdf()
            finally:
                done.set()
                watchdog.cancel()
                cur.close()
            gcols, g, gn = canon_frame(got)
            wcols, w, wn = canon_frame(want)
            if gcols != wcols:
                print(f"FAIL {q}: columns {gcols} vs {wcols}")
                n_fail += 1
                continue
            if gn != wn:
                print(f"FAIL {q}: rows {gn} vs {wn}")
                n_fail += 1
                continue
            bad = []
            for c in gcols:
                for i, (a, b) in enumerate(zip(g[c], w[c])):
                    if a != b:
                        bad.append(f"{c}[row {i}]: spark={a!r} duck={b!r}")
                        break
            if bad:
                hint = ""
                if q.startswith(("q127", "q271")):
                    # the near-dup oracles encode the 16-bit band geometry;
                    # the engine auto-derives width from its guard pre-agg.
                    # On a corpus that auto-widens, recall diverges BY
                    # DESIGN — name the likely cause instead of leaving a
                    # bare hash mismatch (r18 ADVICE)
                    hint = (" [hint: these oracles encode the 16-bit band"
                            " geometry; check bench/verify stderr for an"
                            " 'auto band width 32-bit' pick — verify corpora"
                            " must clear 16-bit under the default cap]")
                print(f"FAIL {q}: " + "; ".join(bad[:3]) + hint)
                n_fail += 1
            else:
                print(f"PASS {q} ({gn} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {q}: EXC {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
