#!/usr/bin/env bash
# 100x scaling probe (round-6 verdict item #7, extended per round-7 item
# #4): build the constant-density (`uniq`) 100x fixture for the tables a
# family subset needs, flatten it, and bench that subset at local[32]
# with the BENCH_LOCAL methodology (3-run medians) so per-query
# sf100/sf0.1 ratios compare directly against BENCH_LOCAL.json.
#
# The fixture flattens to ONE parquet file per table, so a 100x scan
# would get 1-4 input partitions (a real 100x corpus arrives as ~100x
# files) — SPARK_GRAFT_MAX_PART_BYTES=16m restores the scan parallelism
# the fixture's layout (not the plans) took away; see BASELINE.md round 6.
#
# Usage: tools/sf100_probe.sh <queries-csv> [tables-csv] [work_dir]
# Runs sbt — do not run concurrently with any other sbt invocation.
set -euo pipefail
ONLY=${1:?comma-separated query names}
TABLES=${2:-documents}
WORK=${3:-/tmp/graft_sf100}
SRC=/root/testdata/sf0.1
FLAT=${WORK}_flat
cd /root/repo

echo "== [1/3] scale ${SRC} x100 (uniq, tables=${TABLES}) -> ${WORK}"
sbt -batch "runMain graft.tools.MakeScaled $SRC $WORK 100 uniq $TABLES" \
  2>/dev/null | grep -F "scaled $SRC" \
  || { echo "MakeScaled failed"; exit 1; }

echo "== [2/3] flatten -> ${FLAT}"
python3 tools/flatten_scaled.py "$WORK" "$FLAT"

echo "== [3/3] bench subset at 100x (local[32], 64g driver, 16m splits)"
# A name-filtered Bench run never writes BENCH_LOCAL.json (guarded in
# Bench itself); backup anyway so an interrupted run can't lose it —
# restored by trap so a mid-pipeline failure still restores it.
cp BENCH_LOCAL.json /tmp/bench_local.bak
trap 'cp /tmp/bench_local.bak BENCH_LOCAL.json' EXIT
# BENCH_PRIOR=/dev/null: no committed 100x prior exists, and the sf0.1
# default would flag every 100x row as a >5x outlier and re-run it.
SPARK_GRAFT_SF_DIR=$FLAT SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_BENCH_PRIOR=/dev/null \
  SPARK_GRAFT_MAX_PART_BYTES=16777216 SPARK_GRAFT_BENCH_ONLY=$ONLY \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '{"metric"' \
  | sed 's/^\[info\] //' | tee /tmp/bench_sf100_probe.json
echo "sf100 probe complete -> /tmp/bench_sf100_probe.json"
