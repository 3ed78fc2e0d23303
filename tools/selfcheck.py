#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run oracle_sql.json
in DuckDB over the same sf tables and compare with the Verify parquet
dumps (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os
import duckdb, pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))])
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    s, k = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(k.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(k.columns)}")
        fails.append(name); continue
    if len(s) != len(k):
        print(f"FAIL {name}: rows {len(s)} vs {len(k)}"); fails.append(name); continue
    bad = False
    # the driver hashes STRING reprs: int64 vs float64 ("5" vs "5.0")
    # hash-mismatches even when numerically equal (DuckDB SUM(BIGINT)
    # -> HUGEINT -> pandas float64). Catch the dtype-kind drift here.
    for c in s.columns:
        ks_, kk_ = s[c].dtype.kind, k[c].dtype.kind
        if {ks_, kk_} == {"i", "f"} or {ks_, kk_} == {"u", "f"}:
            print(f"FAIL {name}: col {c} dtype kind {s[c].dtype} vs {k[c].dtype}"
                  " (driver string-hash would mismatch; CAST the oracle)")
            bad = True
    for c in s.columns:
        a, b = s[c].values, k[c].values
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(k[c].dtype, np.floating):
            eq = (pd.isna(a) & pd.isna(b)) | (a == b)
        else:
            eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).values
        if not eq.all():
            i = int(np.argmin(eq))
            print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
            bad = True
    if bad: fails.append(name)
    else: print(f"OK   {name} ({len(s)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
