#!/bin/bash
# Round-close ritual (VERDICT r9 item 1: a red test shipped in round 9's
# final commit because the last batch skipped a full suite run).
# Run this BEFORE the closing commit; it fails fast on the first red gate.
#
#   1. full `sbt test` (all suites)
#   2. full graft.Verify + DuckDB selfcheck at sf0.01 (the driver's gate)
#   3. full bench sweep at sf0.1 (refreshes bench/bench_latest.json)
#   4. PLANS.md regeneration (headline physical plans on record)
#
# Usage: tools/close_round.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 sbt test"
sbt -batch test

echo "== 2/4 Verify + selfcheck @ sf0.01"
sbt -batch package
bash tools/run_verify.sh /root/testdata/sf0.01 /tmp/close_round_verify
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/close_round_verify \
  | tail -3 | tee /tmp/close_round_selfcheck.txt
grep -q ", 0 fail" /tmp/close_round_selfcheck.txt \
  || { echo "SELFCHECK RED — do not commit"; exit 1; }

echo "== 3/4 full bench sweep @ sf0.1"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} bash tools/run_bench.sh | tail -1

echo "== 4/4 PLANS.md"
bash tools/run_plandump.sh >/dev/null
echo "close_round: ALL GREEN"
