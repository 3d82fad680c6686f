"""Regenerate COVERAGE.md's tri-scale pass-matrix rows from three
oracle_check.py output files (sf0.001 / sf0.01 / sf0.1, in that order).

Usage:
  python3 tools/coverage_matrix.py oc_sf0001.txt oc_sf001.txt oc_sf01.txt

Prints the markdown table body (one `| query | OK (rows) | ... |` line per
query) plus a pass-count summary to paste into COVERAGE.md. Fails loudly
if the three runs cover different query sets or any line is not OK.
"""
import sys


def parse(path):
    rows = {}
    for line in open(path):
        parts = line.split()
        if len(parts) == 4 and parts[0] in ("OK", "FAIL"):
            rows[parts[1]] = (parts[0], parts[2])
    return rows


runs = [parse(p) for p in sys.argv[1:4]]
keys = sorted(set().union(*[set(r) for r in runs]))
bad = []
print("| query | sf0.001 | sf0.01 | sf0.1 |")
print("|---|---|---|---|")
for q in keys:
    cells = []
    for r in runs:
        st, n = r.get(q, ("MISSING", "-"))
        cells.append(f"{st} ({n})")
        if st != "OK":
            bad.append((q, st))
    print(f"| {q} | {cells[0]} | {cells[1]} | {cells[2]} |")
print()
print(f"-- {len(keys)} queries; "
      f"{'ALL OK' if not bad else 'NOT GREEN: ' + str(bad)}")
sys.exit(1 if bad else 0)
