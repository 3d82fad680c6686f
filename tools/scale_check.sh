#!/bin/bash
# Beyond-bench-scale HASH-VERIFIED oracle replay (VERDICT r16 #3): build an
# x<REPLICAS> corpus from sf0.1 with the BenchScaling replication recipe,
# regenerate the match-fixture slices for the scaled part table (pure-python
# bit-exact scorer, parallelized), dump the hot queries with Verify, and
# DuckDB-compare. BENCH_SCALING.md's curves show the hot plans' CPU scales;
# this shows their ANSWERS stay hash-identical above the bench scale.
#
# Usage: tools/scale_check.sh [replicas] [workRoot] [baseDir]
# (baseDir also via SCALE_CHECK_BASE; default /root/testdata/sf0.1)
# Results: $workRoot/oracle_x{replicas}.txt (one OK/FAIL line per query).
set -euo pipefail
cd "$(dirname "$0")/.."

REPLICAS="${1:-3}"
ROOT="${2:-/tmp/graft_x$REPLICAS}"
BASE="${3:-${SCALE_CHECK_BASE:-/root/testdata/sf0.1}}"
[ -d "$BASE" ] || { echo "scale_check: base dir $BASE does not exist" >&2; exit 1; }
CORPUS="$ROOT/corpus"
FIXTURES="$ROOT/fixtures"
DUMP="$ROOT/dump"

# The hot-query set (r16 plan audit, CPU-desc) restricted to tables the
# scaled corpus materializes (documents/part/lineitem). mm_media_dedup is
# hot but reads NO corpus table (synthetic media payloads sized by a count
# parameter), so a scaled replay would re-run the identical workload —
# its scale story is the payload-partitioning spec, not this gate.
QUERIES="nm_match_topk,nm_match_topk_blocked,nm_match_topk_wide,nm_match_topk_blocked_wide,nm_match_topk_auto,dd_lsh_eval,tx_curate_e2e,q16_sketches,dd_ngram_jaccard,dd_cluster_split_lsh,tx_lm_score,dd_containment,dd_corpus_dedup_quality"

mkdir -p "$ROOT"
echo "== 1/4 scaled corpus (x$REPLICAS) -> $CORPUS"
sbt -batch "runMain graft.ScaledCorpus $BASE $CORPUS $REPLICAS"

echo "== 2/4 fixture slices for the scaled part table -> $FIXTURES"
mkdir -p "$FIXTURES"
# the n_part discriminator selects the slice: the repo CSVs ride along so
# the oracle's read_csv list resolves, contributing zero rows at x-scale
cp fixtures/match_synth.csv fixtures/match_synth_wide.csv \
   fixtures/fuzz_golden.csv fixtures/match_golden.csv "$FIXTURES/"
python3 - "$CORPUS" "$FIXTURES" <<'EOF'
import sys, os
sys.path.insert(0, "tools")
from gen_fuzz_fixture import gen_match_synth_gz, synth_workload, synth_workload_wide
corpus, fixtures = sys.argv[1], sys.argv[2]
gen_match_synth_gz(corpus, f"{fixtures}/match_synth_sf01.csv.gz", synth_workload)
gen_match_synth_gz(corpus, f"{fixtures}/match_synth_wide_sf01.csv.gz",
                   synth_workload_wide)
EOF

# SCALE_CHECK_SHUFFLES: comma list of shuffle-partition counts to replay at
# (default 16 = the core count below). More than one value re-runs the dump
# + compare per count against the SAME corpus/fixtures — hash-matching at
# every count proves the answers are partition-count-invariant, the
# correctness face of BENCH_SCALING.md's "partitions scale with data" caveat.
SHUFFLES="${SCALE_CHECK_SHUFFLES:-16}"
IFS=',' read -ra SHUF_ARR <<< "$SHUFFLES"
for SHUF in "${SHUF_ARR[@]}"; do
  SUFFIX=""
  [ "${#SHUF_ARR[@]}" -gt 1 ] && SUFFIX="_p$SHUF"
  echo "== 3/4 Verify dump (hot queries, shuffle=$SHUF) -> $DUMP$SUFFIX"
  SPARK_GRAFT_QUERIES="$QUERIES" SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_SHUFFLE="$SHUF" \
    GRAFT_FIXTURES_DIR="$FIXTURES" \
    sbt -batch "runMain graft.Verify $CORPUS $DUMP$SUFFIX"

  echo "== 4/4 DuckDB oracle compare (shuffle=$SHUF)"
  python3 tools/oracle_check.py "$CORPUS" "$DUMP$SUFFIX" \
    | tee "$ROOT/oracle_x$REPLICAS$SUFFIX.txt"
done
