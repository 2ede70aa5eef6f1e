#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables.
Usage: tools/verify_local.py <sfDir> <verifyOutDir> [jsonOut]
With jsonOut, also writes a driver-format correctness JSON (per-query
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err).
(Dev-only; duckdb/pandas are driver-side tools, not library deps.)"""
import sys, os, json, glob
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # Driver testdata is one file per table; Spark-generated scale data
    # (tools GenScale) is a directory of part files. Accept both.
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    # GenScale emits events.ts as long nanoseconds (the shape graft's
    # Tables.load sees); the driver's DuckDB side sees TIMESTAMP(NANOS) as a
    # real TIMESTAMP. Re-expose the long column as TIMESTAMP to match.
    ts_type = {c[0]: c[1] for c in con.execute(f"DESCRIBE {name}").fetchall()}
    if ts_type.get("ts") == "BIGINT":
        cols = ", ".join("make_timestamp(ts // 1000) AS ts" if c == "ts" else c
                         for c in ts_type)
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT {cols} "
                    f"FROM read_parquet('{pat}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
                        "err": "no spark output"}
        continue
    got = canon(pd.read_parquet(spark_path))
    try:
        exp = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": len(got),
                        "oracle_rows": 0, "err": f"oracle error: {e}"}
        continue
    ok_rows = len(got) == len(exp)
    ok_cols = list(got.columns) == list(exp.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            gs = got.astype(str)
            es = exp.astype(str)
            ok_vals = gs.equals(es)
        except Exception as e:
            print(f"  compare error {name}: {e}")
    report[name] = {"rows_match": bool(ok_rows), "schema_match": bool(ok_cols),
                    "hash_match": bool(ok_vals), "spark_rows": len(got),
                    "oracle_rows": len(exp), "err": None}
    if ok_rows and ok_cols and ok_vals:
        print(f"OK   {name} ({len(got)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, cols {list(got.columns)} vs {list(exp.columns)}")
        if ok_rows and ok_cols:
            gs, es = got.astype(str), exp.astype(str)
            diff = (gs != es).any(axis=1)
            idx = diff[diff].index[:5]
            for i in idx:
                print(f"  row {i}:\n   spark: {gs.loc[i].to_dict()}\n   duck:  {es.loc[i].to_dict()}")
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
print(("ALL OK" if fails == 0 else f"{fails} FAILURES"))
sys.exit(1 if fails else 0)
