#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare to the Spark parquet dump
(columns sorted by name, rows sorted, exact value equality).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # local iteration: check only queries matching a prefix
        prefixes = only.split(",")
        oracles = {k: v for k, v in oracles.items()
                   if any(k.startswith(p) for p in prefixes)}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sraw = pd.read_parquet(spark_path)
            draw = con.execute(sql).fetchdf()
            # Driver hashes raw values: a dtype mismatch (e.g. DuckDB HUGEINT
            # from integer sum() -> float64/object vs Spark int64) fails there
            # even when values are numerically equal. Surface it here.
            for c in sorted(set(sraw.columns) & set(draw.columns)):
                sd, dd = sraw[c].dtype, draw[c].dtype
                if sd != dd:
                    print(f"WARN {name}: dtype mismatch col {c}: spark={sd} duck={dd} (driver hash may fail)")
            sdf = canon(sraw)
            ddf = canon(draw)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}"); n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        if len(sdf) == 0:
            print(f"WARN {name}: 0 rows (matches, but weak)"); n_pass += 1; continue
        eq = True
        for c in sdf.columns:
            a, b = sdf[c].values, ddf[c].values
            if np.issubdtype(sdf[c].dtype, np.floating):
                ok = ((a == b) | (pd.isna(a) & pd.isna(b))).all()
                if not ok:
                    d = np.nanmax(np.abs(a - b))
                    print(f"FAIL {name}: col {c} maxdiff={d}"); eq = False; break
            else:
                if not (a == b).all():
                    i = np.argmax(a != b)
                    print(f"FAIL {name}: col {c} first mismatch row {i}: {a[i]!r} vs {b[i]!r}"); eq = False; break
        if eq: n_pass += 1; print(f"PASS {name} ({len(sdf)} rows)")
        else: n_fail += 1
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip('/'))
        if name not in oracles:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
