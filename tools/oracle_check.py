"""DuckDB oracle parity gate: run every oracle_sql.json entry against the
same parquet tables Spark read, and compare sorted stringified frames.

Queries run in PARALLEL worker processes (one DuckDB connection each —
connections are cheap, and the HUGEINT-emulated minhash/FNV kernels that
dominate sf0.1 replay are CPU-bound), so a tri-scale COVERAGE regeneration
is minutes, not an hour. Output stays ordered and line-compatible with the
serial form: one "OK/FAIL <query> <rows> <rows>" per query (sorted), then
the FAILS list."""
import duckdb, json, glob, os, sys
from concurrent.futures import ProcessPoolExecutor
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_dump"
jobs = int(sys.argv[3]) if len(sys.argv) > 3 else min(16, os.cpu_count() or 4)

_con = None


def _mem_limit_gb():
    """Per-connection DuckDB memory cap: DuckDB's default limit is 80% of
    RAM PER CONNECTION, so `jobs` workers each replaying a 100M-pair match
    oracle at the x10 scale stack to several hundred percent of the box —
    the r19 x10 run lost a worker to the OOM killer at 60 GB RSS. Cap each
    connection to its fair share of 80% of RAM (floor 2 GB) and give it a
    spill directory so past-limit operators page to disk instead of dying.
    Override with ORACLE_CHECK_MEM_GB."""
    env = os.environ.get("ORACLE_CHECK_MEM_GB")
    if env:
        return max(1, int(env))
    pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    return max(2, int(pages * 0.8 / jobs / 2**30))


def _connect():
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{_mem_limit_gb()}GB'")
    spill = f"/tmp/duckdb_spill_{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-8]
        src = f"'{p}/**/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet({src})")
    return con


def _init():
    global _con
    _con = _connect()


def _norm(df):
    df = df[sorted(df.columns)]
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _check(item):
    q, sql = item
    try:
        spark = pd.read_parquet(f"{dump}/{q}")
        ora = _con.execute(sql).df()
        s, o = _norm(spark), _norm(ora)
        ok = list(s.columns) == list(o.columns) and len(s) == len(o) and s.equals(o)
        detail = ""
        if not ok:
            if list(s.columns) != list(o.columns):
                detail = (f"  spark cols: {list(s.columns)}\n"
                          f"  oracle cols: {list(o.columns)}")
            elif len(s) != len(o):
                detail = f"  row counts {len(s)} vs {len(o)}"
            else:
                detail = str(s.compare(o).head(5))
        return q, ok, len(s), len(o), detail
    except Exception as e:  # surface the query name with the error
        return q, False, -1, -1, f"  error: {e}"


oracles = json.load(open(f"{dump}/oracle_sql.json"))
items = sorted(oracles.items())
fails = []
with ProcessPoolExecutor(max_workers=jobs, initializer=_init) as pool:
    for q, ok, ns, no, detail in sorted(pool.map(_check, items)):
        # flush per line: multi-hour beyond-bench replays are watched
        # through a redirected file, and block buffering hides progress
        print(("OK  " if ok else "FAIL"), q, ns, no, flush=True)
        if not ok:
            fails.append(q)
            print(detail, flush=True)
print("FAILS:", fails, flush=True)
