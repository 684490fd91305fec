#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views of the sf parquet tables, load the Spark parquet dump, sort columns by
name, and compare values (exact; floats via repr equality after rounding
checks). Prints a per-query PASS/FAIL line.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif df[c].dtype == object:
            # decimals -> canonical string
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    n_pass = n_fail = 0
    for q in sorted(oracles):
        spark_dir = os.path.join(out_dir, q)
        try:
            got = pd.read_parquet(spark_dir)
            want = con.execute(oracles[q]).fetchdf()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {q}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1; continue
            if len(g) != len(w):
                print(f"FAIL {q}: rows {len(g)} vs {len(w)}")
                n_fail += 1; continue
            bad = []
            for c in g.columns:
                gv, wv = g[c], w[c]
                if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
                    eq = np.isclose(gv.astype(float).fillna(np.nan),
                                    wv.astype(float).fillna(np.nan),
                                    rtol=0, atol=0, equal_nan=True)
                else:
                    eq = (gv.fillna('\0') == wv.fillna('\0')) if gv.dtype == object else (gv.fillna(-2**60) == wv.fillna(-2**60))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[row {i}]: spark={gv.iloc[i]!r} duck={wv.iloc[i]!r}")
            if bad:
                print(f"FAIL {q}: " + "; ".join(bad[:3])); n_fail += 1
            else:
                print(f"PASS {q} ({len(g)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {q}: EXC {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
