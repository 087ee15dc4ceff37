#!/usr/bin/env bash
# The per-round 10x gate (round-4 verdict item #5, made mechanical):
# build the CONSTANT-DENSITY 10x fixture (`uniq` mode — replica tokens
# perturbed so duplicate density, not duplicate count, is what scales),
# run the full oracle sweep on it, then snapshot the full bench as
# BENCH_sf1.json. BENCH_LOCAL.json is backed up and restored around the
# bench run (graft.Bench persists full runs there by design).
#
# Usage: tools/sf1_gate.sh [src_sf_dir] [work_dir] [copies]
# Runs sbt — do not run concurrently with any other sbt invocation.
set -euo pipefail
SRC=${1:-/root/testdata/sf0.1}
WORK=${2:-/tmp/graft_sf1u}
COPIES=${3:-10}
FLAT=${WORK}_flat
cd /root/repo

echo "== [1/4] scale ${SRC} x${COPIES} (uniq) -> ${WORK}"
sbt -batch "runMain graft.tools.MakeScaled $SRC $WORK $COPIES uniq" \
  2>/dev/null | grep -F "scaled $SRC" \
  || { echo "MakeScaled failed"; exit 1; }

echo "== [2/4] flatten -> ${FLAT}"
python3 tools/flatten_scaled.py "$WORK" "$FLAT"

# Optional targeted sweep: SF1_ORACLE_ONLY=q1,q2 restricts Verify + the
# DuckDB compare to those queries (the full 10x sweep is hours of DuckDB
# time in the pairwise/recursive oracle CTEs — run it on the round's
# plan-changed queries; the full sweep is a once-per-major-round cost).
echo "== [3/4] Verify + oracle sweep at 10x (${SF1_ORACLE_ONLY:-full})"
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify $FLAT /tmp/verify_sf1 ${SF1_ORACLE_ONLY:-}" 2>/dev/null | tail -1
python3 tools/check_oracle.py "$FLAT" /tmp/verify_sf1 ${SF1_ORACLE_ONLY:-} | tail -6

echo "== [4/4] bench at 10x -> BENCH_sf1.json"
# NOTE: same core count as BENCH_LOCAL (local[32]) — an sf1/sf0.1 time
# ratio is only meaningful at equal parallelism (a CPUS=4/8 run inflates
# CPU-bound rows ~3-4x and poisons every family ratio). Pinned
# EXPLICITLY: graft.Bench defaults to 4 cores when the env is unset, so
# an env-less gate run used to silently bench the 10x fixture at 4
# cores against a 32-core BENCH_LOCAL.
# MAX_PART_BYTES=32m: the flattened 1-file fixture otherwise serializes
# scan-shaped stages at 10x (1-4 input partitions for a corpus a real 10x
# deployment would receive as ~10x more files) — pinned like
# sf100_probe.sh so family ratios measure plans, not fixture layout.
cp BENCH_LOCAL.json /tmp/bench_local.bak
trap 'cp /tmp/bench_local.bak BENCH_LOCAL.json' EXIT
# BENCH_PRIOR: the outlier re-run pass must compare same-sf medians —
# the previous committed BENCH_sf1.json, not the sf0.1 BENCH_LOCAL
# default (every 10x row reads >5x an sf0.1 prior and would re-run).
cp BENCH_sf1.json /tmp/bench_sf1.prior 2>/dev/null || echo '{}' > /tmp/bench_sf1.prior
SPARK_GRAFT_SF_DIR=$FLAT SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_PRIOR=/tmp/bench_sf1.prior \
  SPARK_GRAFT_MAX_PART_BYTES=33554432 sbt -batch \
  "runMain graft.Bench" 2>/dev/null | grep '{"metric"' \
  | sed 's/^\[info\] //' > BENCH_sf1.json
head -c 400 BENCH_sf1.json; echo
echo "sf1 gate complete"
