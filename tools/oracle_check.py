import duckdb, json, glob, os, sys
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_dump"
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/**/*.parquet') " if os.path.isdir(p) else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(f"{dump}/oracle_sql.json"))
fails = []
for q, sql in sorted(oracles.items()):
    spark = pd.read_parquet(f"{dump}/{q}")
    ora = con.execute(sql).df()
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, o = norm(spark), norm(ora)
    ok = list(s.columns) == list(o.columns) and len(s) == len(o) and s.equals(o)
    print(("OK  " if ok else "FAIL"), q, len(s), len(o))
    if not ok:
        fails.append(q)
        if list(s.columns) != list(o.columns):
            print("  spark cols:", list(s.columns)); print("  oracle cols:", list(o.columns))
        else:
            diff = s.compare(o) if len(s)==len(o) else None
            print(diff.head(5) if diff is not None else f"  row counts {len(s)} vs {len(o)}")
print("FAILS:", fails)
