"""Dump-vs-dump hash compare for the shuffle-partition replay: proves the
answers at a scaled shuffle-partition count are IDENTICAL to the
oracle-verified reference dump, query by query.

Rationale (r19): the DuckDB oracle leg is partition-count-INDEPENDENT —
its SQL never sees Spark's shuffle config — so re-running DuckDB once per
shuffle count (the r18 harness shape) re-verifies DuckDB against itself
and pays the full oracle replay cost each time. Transitivity gives the
same guarantee cheaper: oracle-match the reference dump once, then show
every other count's dump equals the reference. Same normalization as
tools/oracle_check.py (sorted columns, stringified, row-sorted), so
"equal" here is exactly the oracle gate's notion of equal.

Usage: python3 tools/dump_diff.py <referenceDump> <candidateDump>
Output: one OK/FAIL line per query in the reference dump, then FAILS list.
Exit 1 if any query differs or is missing from the candidate.
"""
import glob, os, sys
import pandas as pd

ref, cand = sys.argv[1], sys.argv[2]


def _norm(df):
    df = df[sorted(df.columns)]
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


fails = []
queries = sorted(
    os.path.basename(p) for p in glob.glob(f"{ref}/*")
    if os.path.isdir(p))
for q in queries:
    try:
        a = _norm(pd.read_parquet(f"{ref}/{q}"))
        b = _norm(pd.read_parquet(f"{cand}/{q}"))
        ok = list(a.columns) == list(b.columns) and len(a) == len(b) \
            and a.equals(b)
        print(("OK  " if ok else "FAIL"), q, len(a), len(b))
        if not ok:
            fails.append(q)
            if list(a.columns) != list(b.columns):
                print(f"  ref cols: {list(a.columns)}\n"
                      f"  cand cols: {list(b.columns)}")
            elif len(a) != len(b):
                print(f"  row counts {len(a)} vs {len(b)}")
            else:
                print(a.compare(b).head(5))
    except Exception as e:
        fails.append(q)
        print("FAIL", q, "-1 -1")
        print(f"  error: {e}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
