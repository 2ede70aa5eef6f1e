import sys, os, glob, json
import duckdb, pandas as pd
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    t = os.path.basename(p)[:-8]
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
got = pd.read_parquet(os.path.join(out_dir, name))
exp = con.execute(oracle[name]).fetchdf()
got = got[sorted(got.columns)].reset_index(drop=True)
exp = exp[sorted(exp.columns)].reset_index(drop=True)
print("spark rows:", len(got), "oracle rows:", len(exp))
print("equal:", got.astype(str).equals(exp.astype(str)))
if not got.astype(str).equals(exp.astype(str)):
    print(got.head(10)); print(exp.head(10))
