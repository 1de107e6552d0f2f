#!/usr/bin/env bash
# Round-close gate (r11 verdict #2/#3): the LAST thing to run before the
# end-of-round snapshot commit. Round 11 built FreshnessCheck and then
# committed new query entries AFTER it had run — the gate must be a
# single mechanical command, not a checklist item. A red exit here means
# DO NOT commit new query entries; fix or revert first.
#
# Usage: tools/round_close.sh  (from the repo root; ~15 min)
#
# Order matters:
#  1. full test suite (includes OperatorSweepSpec = every entry runs on
#     sf0.001, and FreshnessSpec = COVERAGE.md counts match the code)
#  2. full self-bench at sf0.1 -> BENCH_SELF.json (a RESTRICTED bench
#     writes BENCH_PARTIAL.json and does NOT satisfy the gate)
#  3. FreshnessCheck against that fresh BENCH_SELF.json
#  4. correctness gate at sf0.01 against the DuckDB oracle
# Steps 2-4 re-derive everything from the CODE at HEAD, so an entry
# added after an earlier (passing) run cannot slip through.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] sbt test (operator sweep + freshness + all specs)"
sbt -batch test

echo "== [2/4] full self-bench at sf0.1 -> BENCH_SELF.json"
# Bench WRITES BENCH_SELF.json itself (full query names); its stdout
# line carries short names for the driver's tail window — do NOT
# redirect stdout into the file (that clobbers the full-name artifact
# FreshnessCheck validates; the original script did exactly that)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /dev/null
[ -s BENCH_SELF.json ] || { echo "FAIL: bench wrote no BENCH_SELF.json"; exit 1; }

echo "== [3/4] FreshnessCheck (COVERAGE.md + BENCH_SELF.json vs code)"
sbt -batch "runMain graft.tools.FreshnessCheck BENCH_SELF.json"

echo "== [4/4] correctness gate at sf0.01 (DuckDB oracle)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_close"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_close

echo "ROUND-CLOSE GATE: GREEN — safe to snapshot"
