#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
compare sorted-by-column-name values.
Usage: devcheck.py <sfDir> <outDir> [--tz <TimeZone>]

The optional --tz runs the DuckDB session under a NON-UTC time zone: the
driver's DuckDB session is not guaranteed UTC (round-4 geo_viirs_ingest
went red exactly this way), so the standing gate is to pass BOTH with no
--tz and with --tz America/Los_Angeles — any oracle whose result moves
with the session TZ is env-sensitive and must be rewritten (naive
make_timestamp/strptime or integer epoch math, never
strftime(to_timestamp(...)))."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:]]
tz = None
if "--tz" in args:
    i = args.index("--tz"); tz = args[i+1]; del args[i:i+2]
sfdir, outdir = args[0], args[1]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
# the oracle engine version belongs in every gate record (SURVEY §6):
# a DuckDB upgrade that changes hash/format behavior must be visible
print(f"oracle engine: duckdb {duckdb.__version__}")
if tz:
    con.execute(f"SET TimeZone='{tz}'")
import os
for t in TABLES:
    # driver testdata ships single parquet files; ScaleUp dirs are Spark
    # part-file directories — glob those
    pat = f"{sfdir}/{t}.parquet"
    if os.path.isdir(pat):
        pat = f"{pat}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
            df[c] = s.apply(lambda b: b.hex())
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and len(s) and isinstance(s.iloc[0], int):
            try: df[c] = s.astype("int64")
            except Exception: pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p):
        continue
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        print(f"  {name}: NO PARQUET (query failed)"); fail += 1; continue
    got = pd.read_parquet(p)
    if name not in oracle:
        # mirror the driver's rows>0 smoke check: an empty rows-only output
        # is a silent breakage, count it as a failure
        if len(got) > 0:
            print(f"  {name}: rows-only check — {len(got)} rows OK"); ok += 1
        else:
            print(f"  {name}: rows-only check — EMPTY (fail)"); fail += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"  {name}: ORACLE SQL ERROR: {str(e)[:200]}"); fail += 1; continue
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        print(f"  {name}: SCHEMA MISMATCH spark={list(g.columns)} duck={list(e.columns)}"); fail += 1; continue
    if len(g) != len(e):
        print(f"  {name}: ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}"); fail += 1; continue
    bad = []
    # typed-hash emulation (round 7): the driver's hash distinguishes
    # int64 from float64/Decimal-object even when values are numerically
    # equal — an uncast DuckDB HUGEINT (SUM over BIGINT) or a DECIMAL
    # literal division lands as float64/object in pandas and goes
    # hash-red while this script's coercing value compare stays green
    # (exactly the round-4..6 red-five signature). Flag any cross-family
    # dtype mismatch; int32-vs-int64 is driver-normalized and ignored.
    def fam(s):
        if pd.api.types.is_integer_dtype(s): return "int"
        if pd.api.types.is_float_dtype(s): return "float"
        if pd.api.types.is_bool_dtype(s): return "bool"
        if pd.api.types.is_datetime64_any_dtype(s): return "ts"
        if s.dtype == object and len(s) and isinstance(s.iloc[0], str): return "str"
        return f"obj:{type(s.iloc[0]).__name__ if len(s) else '?'}"
    for c in g.columns:
        fa, fb = fam(g[c]), fam(e[c])
        if fa != fb:
            bad.append((c, f"DTYPE-FAMILY {fa} vs {fb} (driver hash-red even if values equal)"))
    if bad:
        print(f"  {name}: TYPE MISMATCH {bad[:4]}"); fail += 1; continue
    for c in g.columns:
        a, b = g[c], e[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            an, bn = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            # bitwise, like the driver's hash: -0.0 != 0.0 there
            eq = ((an == bn) & (np.signbit(an) == np.signbit(bn))) \
                 | (np.isnan(an) & np.isnan(bn))
        else:
            eq = (a.astype(str).to_numpy() == b.astype(str).to_numpy())
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append((c, i, a.iloc[i], b.iloc[i]))
    if bad:
        print(f"  {name}: VALUE MISMATCH {bad[:3]}"); fail += 1
    else:
        print(f"  {name}: OK ({len(g)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
