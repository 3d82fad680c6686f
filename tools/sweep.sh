#!/bin/bash
# One clean same-protocol sf0.1 bench sweep: the adjudication/re-pin
# protocol documented in BENCH_BASELINE.json.source (min-of-3 reps per
# query after the sf0.01 warmup pass, contention gate active). Appends
# the one-line JSON artifact to the file given as $1 (default
# /tmp/graft_sweeps.jsonl) so multi-sweep medians are scriptable.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_sweeps.jsonl}"
# sbt prefixes runMain stdout with "[info] " — strip it before matching
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  | sed -E 's/^\[info\] //' | grep -E '^\{"metric"' >> "$OUT"
tail -1 "$OUT" | python3 -c "
import json,sys
d=json.loads(sys.stdin.read())
print('wall total %.1f cpu total %.1f load_start %s' % (
  sum(d['queries'].values()), sum(d.get('queries_cpu',{}).values()),
  d.get('loadavg_start')))
print('regressions:', json.dumps(d.get('regressions',{}))[:400])
print('drift:', json.dumps(d.get('drift',{}))[:400])
print('wall_drift:', json.dumps(d.get('wall_drift',{}))[:400])
"
