#!/usr/bin/env python3
"""Stricter emulation of the driver's compare: pandas sort_values over
all columns + exact value hashing (no float rounding). Catches type
drift (HUGEINT vs int64) and unhashable array columns that the lenient
oracle_check.py normalizes away.
Usage: driver_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, hashlib
import duckdb, pandas as pd, pyarrow.parquet as pq

def frame_hash(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        for v in df[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()

def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}"); fails += 1; continue
        spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        try:
            duck_df = con.sql(oracle[name]).df()
            hs, hd = frame_hash(spark_df), frame_hash(duck_df)
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {e}"); fails += 1; continue
        if hs != hd:
            print(f"HASH-MISMATCH {name} ({len(spark_df)} vs {len(duck_df)} rows)")
            a = spark_df[sorted(spark_df.columns)].sort_values(by=sorted(spark_df.columns), kind="mergesort").reset_index(drop=True)
            b = duck_df[sorted(duck_df.columns)].sort_values(by=sorted(duck_df.columns), kind="mergesort").reset_index(drop=True)
            for c in a.columns:
                if c not in b.columns: print(f"  col {c} missing in oracle"); break
                av, bv = a[c].tolist(), b[c].tolist()
                for i,(x,y) in enumerate(zip(av,bv)):
                    if repr(x) != repr(y):
                        print(f"  col {c} row {i}: spark={x!r} ({type(x).__name__}) duck={y!r} ({type(y).__name__})"); break
                else: continue
                break
            fails += 1; continue
        print(f"OK {name} ({len(spark_df)} rows)")
    print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], set(sys.argv[3:])) else 0)
