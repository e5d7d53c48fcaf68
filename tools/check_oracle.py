#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 gate: run each oracle SQL in
DuckDB over the sf tables, compare to the Verify parquet dumps
(column-name-sorted, row-sorted, exact value match with small float
tolerance reported separately)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        bad.append((name, "NO SPARK OUTPUT")); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {e}")); continue
    sdf = pd.read_parquet(spark_path)
    # driver-style normalize: sort columns by name, sort rows by all cols
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    if sorted(odf.columns) != sorted(sdf.columns):
        bad.append((name, f"SCHEMA: oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")); continue
    o, s_ = norm(odf), norm(sdf)
    if len(o) != len(s_):
        bad.append((name, f"ROWS: oracle={len(o)} spark={len(s_)}")); continue
    mismatch = []
    for c in o.columns:
        oc, sc = o[c], s_[c]
        if oc.dtype.kind == "f" or sc.dtype.kind == "f":
            eq = np.isclose(oc.astype(float), sc.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            exact = (oc.astype(float).values == sc.astype(float).values) | (oc.isna() & sc.isna()).values
            if not eq.all():
                mismatch.append(f"{c}: {int((~eq).sum())} diffs (first: {oc[~eq].iloc[0]} vs {sc[~eq].iloc[0]})")
            elif not exact.all():
                mismatch.append(f"{c}: FLOAT-INEXACT {int((~exact).sum())} rows (tolerance-close)")
        else:
            eq = (oc.astype(str).values == sc.astype(str).values)
            if not eq.all():
                mismatch.append(f"{c}: {int((~eq).sum())} diffs (first: {oc[~eq].iloc[0]!r} vs {sc[~eq].iloc[0]!r})")
    if mismatch:
        bad.append((name, "; ".join(mismatch)))
    else:
        ok.append((name, len(o)))

print(f"== OK ({len(ok)}) ==")
for n, r in ok: print(f"  {n}: {r} rows")
print(f"== BAD ({len(bad)}) ==")
for n, m in bad: print(f"  {n}: {m}")
no_oracle = [os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)
             and os.path.basename(p) not in oracle]
print(f"== rows-only (no oracle): {sorted(no_oracle)}")
sys.exit(1 if bad else 0)
