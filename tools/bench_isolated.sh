#!/usr/bin/env bash
# Fresh-JVM isolated re-timer (r10 verdict "Next round #5").
#
# The recorded BENCH_r{N} runs all 430+ gates in ONE shared JVM; as the
# suite grows, JIT/GC/heap pressure drifts untouched queries 1.1-1.4x
# between rounds. This script times each requested gate in its OWN JVM
# (java -cp, no sbt in the measured path), so a round-over-round wall
# change can be attributed: isolated number moved -> the plan changed;
# only the suite number moved -> shared-JVM pressure, not a regression.
#
# Usage:
#   tools/bench_isolated.sh [q1,q2,...]    # default: the top-20 list below
# Env:
#   SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
#   SPARK_GRAFT_CPUS    (default 32)
#   ITERS               per-JVM bench passes (default 2; min is recorded)
#
# Output: one JSON line {"metric":"isolated",...,"queries":{...}} and
# bench_isolated.json in the repo root.
#
# Requires compiled classes: run `sbt -batch compile` first (the script
# refuses to measure against a stale/missing classes dir rather than
# silently timing old code).

set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
ITERS="${ITERS:-2}"
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "no $CLASSES — run: sbt -batch compile" >&2; exit 1; }

# top-20 by BENCH_r10 wall (the judge's round-over-round watchlist), plus
# the freshly re-pointed fold family
DEFAULT_QUERIES="q_holt_winters,q_holt_smooth,q_ppr,q_pagerank,q_stream_funnel,q_stream_windows,q_exp_smooth,q_assoc_rules,q_token_bucket,q_stream_dedup,q_weighted_median,q_cooccurrence,q_item_cosine,q_croston,q_ledger_balance,q1_agg,q_tpch_q3,q_minhash_quality,q_ann_recall,q_dedup_exact"
QUERIES="${1:-$DEFAULT_QUERIES}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

CP="$CLASSES:/opt/spark/jars/*"
OUT="{"
SEP=""
TOTAL=0
for q in $(echo "$QUERIES" | tr ',' ' '); do
  # one fresh JVM per query; Bench's own min-over-passes runs inside it
  LINE=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
         SPARK_GRAFT_BENCH_ITERS="$ITERS" SPARK_GRAFT_BENCH_ONLY="$q" \
         java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
              -Dspark.sql.session.timeZone=UTC \
              -cp "$CP" graft.Bench 2>/dev/null | grep '"metric"' | tail -1)
  # Bench writes bench_full.json/BENCH_FULL.json as scratch; restore below.
  VAL=$(echo "$LINE" | python3 -c "import json,sys; d=json.load(sys.stdin); print(d['queries']['$q'])")
  echo "  $q: ${VAL}s" >&2
  OUT="$OUT$SEP\"$q\":$VAL"
  SEP=","
  TOTAL=$(python3 -c "print($TOTAL + $VAL)")
done
git checkout -q BENCH_FULL.json 2>/dev/null || true
rm -f bench_full.json
LINE="{\"metric\":\"isolated\",\"value\":$TOTAL,\"unit\":\"sec\",\"sf\":\"$SF_DIR\",\"iters_per_jvm\":$ITERS,\"queries\":$OUT}}"
echo "$LINE"
echo "$LINE" > bench_isolated.json
