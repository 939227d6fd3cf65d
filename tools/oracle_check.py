#!/usr/bin/env python3
"""Mimic the driver's correctness gate: for each query, compare the Spark
parquet dump against DuckDB running the oracle SQL over the same testdata.
Columns sorted by name, rows sorted by all columns, values hashed."""
import duckdb, glob, hashlib, json, math, os, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf001"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

def hash_df(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted([tuple(canon(v) for v in r) for r in df.itertuples(index=False)])
    h = hashlib.md5()
    for r in rows: h.update(("|".join(r) + "\n").encode())
    return h.hexdigest(), len(rows), cols

fails = []
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    hs, ns, cs = hash_df(spark_df)
    hd, nd, cd = hash_df(duck_df)
    if cs != cd:
        fails.append((name, f"SCHEMA spark={cs} duck={cd}"))
    elif ns != nd:
        fails.append((name, f"ROWS spark={ns} duck={nd}"))
    elif hs != hd:
        fails.append((name, f"HASH mismatch ({ns} rows)"))
    else:
        print(f"OK    {name} ({ns} rows)")
for name, why in fails:
    print(f"FAIL  {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
