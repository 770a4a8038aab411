#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (t2 gate).
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb, pyarrow.parquet as pq

def norm(v):
    if v is None: return None
    if isinstance(v, bool): return v
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return round(v, 9)
    if isinstance(v, (int, str)): return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return round(float(v), 9)
    except Exception: pass
    import datetime
    if isinstance(v, datetime.datetime): return v.isoformat()
    return str(v)

def keyed(rows):
    return sorted(rows, key=lambda t: tuple((v is None, str(type(v)), v) for v in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}"); fails += 1; continue
        spark_t = pq.read_table(files[0]) if len(files)==1 else pq.read_table(f"{out_dir}/{name}")
        cols = sorted(spark_t.column_names)
        spark_rows = keyed([tuple(norm(r[c]) for c in cols) for r in spark_t.to_pylist()])
        try:
            duck = con.sql(oracle[name])
            dcols = sorted(duck.columns)
            idx = [duck.columns.index(c) for c in dcols]
            duck_rows = keyed([tuple(norm(row[i]) for i in idx) for row in duck.fetchall()])
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); fails += 1; continue
        if cols != dcols:
            print(f"SCHEMA-MISMATCH {name}: spark={cols} duck={dcols}"); fails += 1; continue
        if spark_rows != duck_rows:
            print(f"HASH-MISMATCH {name}: spark_rows={len(spark_rows)} duck_rows={len(duck_rows)}")
            for i,(a,b) in enumerate(zip(spark_rows, duck_rows)):
                if a != b:
                    print(f"  first diff at sorted-row {i}:\n    spark={a}\n    duck ={b}"); break
            else:
                only_s = set(spark_rows) - set(duck_rows)
                only_d = set(duck_rows) - set(spark_rows)
                print(f"  only-spark sample: {list(only_s)[:2]}\n  only-duck sample: {list(only_d)[:2]}")
            fails += 1; continue
        print(f"OK {name} ({len(spark_rows)} rows)")
    print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
