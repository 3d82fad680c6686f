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
# Results: $workRoot/oracle_x{replicas}.txt (one OK/FAIL line per query)
# at the default 16 shuffle partitions; any other count in
# SCALE_CHECK_SHUFFLES writes the suffixed oracle_x{replicas}_p{count}.txt
# (and dump dir dump_p{count}) so every saved artifact records the
# partition count that produced it. The first count's file is the DuckDB
# compare; later counts' files are dump-vs-reference compares (oracle
# equality by transitivity — see the SCALE_CHECK_SHUFFLES note below).
#
# Stages 1 and 2 are RESUMABLE: a table/fixture whose output already
# exists is skipped (ScaledCorpus skips per-table; the fixture stage skips
# when both gz workloads are present), so an interrupted run — the r18 x10
# attempt died after stage 2 — continues from where it stopped instead of
# re-paying the corpus/fixture build.
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
# scaled corpus materializes (documents/part/lineitem/embeddings).
# mm_media_dedup is hot but reads NO corpus table (synthetic media payloads
# sized by a count parameter), so a scaled replay would re-run the identical
# workload — its scale story is the payload-partitioning spec, not this
# gate. ss_knn_sq8_compact / ss_knn_sq8_delete (r18 verdict #7): the
# growing index's maintenance path carries the same beyond-bench evidence
# as the serve path — both replay the full index lifecycle (seed-frozen
# scales, batch admission, compaction rewrite / tombstone anti-join)
# against the scaled embeddings table.
#
# SCALE_CHECK_QUERIES overrides the set. COST WARNING (measured r19): the
# SPARK side dumps all 15 at x10 in ~16 min, but the DuckDB legs for the
# match/dedup queries grow brutally — the wide match replay is a 200M-row
# CASE cascade (11.2 CPU-h at x10) and the dedup pair-verifies are
# unindexed list intersections (3.5-11 CPU-h each) — >25 CPU-h total at
# x10 vs minutes at x3. For x10+ runs, anchor a cheap subset (e.g. the
# lifecycle pair) in DuckDB and rely on dump_diff + the x3/tri-scale
# anchors for the rest; that asymmetry is itself the scale story.
QUERIES="${SCALE_CHECK_QUERIES:-nm_match_topk,nm_match_topk_blocked,nm_match_topk_wide,nm_match_topk_blocked_wide,nm_match_topk_auto,dd_lsh_eval,tx_curate_e2e,q16_sketches,dd_ngram_jaccard,dd_cluster_split_lsh,tx_lm_score,dd_containment,dd_corpus_dedup_quality,ss_knn_sq8_compact,ss_knn_sq8_delete}"

mkdir -p "$ROOT"
echo "== 1/4 scaled corpus (x$REPLICAS) -> $CORPUS"
# ScaledCorpus skips tables whose parquet dir already exists (per-table
# resume), so re-running after a recipe gains a table only writes the new
# one.
sbt -batch "runMain graft.ScaledCorpus $BASE $CORPUS $REPLICAS"

echo "== 2/4 fixture slices for the scaled part table -> $FIXTURES"
mkdir -p "$FIXTURES"
if [ -s "$FIXTURES/match_synth_sf01.csv.gz" ] && \
   [ -s "$FIXTURES/match_synth_wide_sf01.csv.gz" ]; then
  echo "   [skip] both gz workloads already present in $FIXTURES"
else
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
fi

# SCALE_CHECK_SHUFFLES: comma list of shuffle-partition counts to replay at
# (default 16 = the core count below). More than one value re-runs the dump
# per count against the SAME corpus/fixtures — hash-matching at every
# count proves the answers are partition-count-invariant, the correctness
# face of BENCH_SCALING.md's "partitions scale with data" caveat. The
# FIRST count gets the DuckDB oracle compare; later counts compare their
# dump against the first count's dump (tools/dump_diff.py, same
# normalization): the oracle SQL never sees Spark's shuffle config, so a
# per-count DuckDB re-run would re-verify DuckDB against itself at full
# replay cost — transitivity through the oracle-verified reference dump
# is the identical guarantee. Each element must be a bare positive
# integer (fail-fast, ADVICE r18): a stray space or empty element would
# otherwise split the single-quoted sbt invocation or hand Spark an empty
# partition count.
SHUFFLES="${SCALE_CHECK_SHUFFLES:-16}"
IFS=',' read -ra SHUF_RAW <<< "$SHUFFLES"
SHUF_ARR=()
for RAW in "${SHUF_RAW[@]}"; do
  SHUF="${RAW//[[:space:]]/}"
  if ! [[ "$SHUF" =~ ^[0-9]+$ ]] || [ "$SHUF" -eq 0 ]; then
    echo "scale_check: SCALE_CHECK_SHUFFLES element '$RAW' is not a" \
         "positive integer (got list '$SHUFFLES')" >&2
    exit 1
  fi
  SHUF_ARR+=("$SHUF")
done
REF_DUMP=""
REF_SHUF=""
for SHUF in "${SHUF_ARR[@]}"; do
  # Any non-default count gets a suffix even when it is the ONLY count
  # (ADVICE r18): an unsuffixed artifact always means shuffle=16, so a
  # saved result can never mask which partition count produced it.
  SUFFIX=""
  [ "$SHUF" != "16" ] && SUFFIX="_p$SHUF"
  echo "== 3/4 Verify dump (hot queries, shuffle=$SHUF) -> $DUMP$SUFFIX"
  SPARK_GRAFT_QUERIES="$QUERIES" SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_SHUFFLE="$SHUF" \
    GRAFT_FIXTURES_DIR="$FIXTURES" \
    sbt -batch "runMain graft.Verify $CORPUS $DUMP$SUFFIX"

  if [ -z "$REF_DUMP" ]; then
    echo "== 4/4 DuckDB oracle compare (shuffle=$SHUF, reference count)"
    python3 tools/oracle_check.py "$CORPUS" "$DUMP$SUFFIX" \
      | tee "$ROOT/oracle_x$REPLICAS$SUFFIX.txt"
    REF_DUMP="$DUMP$SUFFIX"
    REF_SHUF="$SHUF"
  else
    echo "== 4/4 dump-vs-reference compare (shuffle=$SHUF vs $REF_SHUF;" \
         "oracle equality by transitivity)"
    python3 tools/dump_diff.py "$REF_DUMP" "$DUMP$SUFFIX" \
      | tee "$ROOT/oracle_x$REPLICAS$SUFFIX.txt"
  fi
done
