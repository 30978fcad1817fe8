#!/usr/bin/env bash
# Full local gate, in driver order: compile, unit/plan/stream tests, the
# DuckDB oracle compare at the gate sf, then both mechanical determinism
# sweeps (partition count, join strategy) at the small sf.
# Usage: scripts/ci.sh [gateSfDir] [sweepSfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
GATE_SF="${1:-/root/testdata/sf0.01}"
SWEEP_SF="${2:-/root/testdata/sf0.001}"

sbt -batch Test/compile
sbt -batch test

rm -rf /tmp/graft_ci_dump
sbt -batch "runMain graft.Verify $GATE_SF /tmp/graft_ci_dump"
python3 scripts/oracle_check.py "$GATE_SF" /tmp/graft_ci_dump

python3 scripts/oracle_check.py --partition-sweep "$SWEEP_SF"
python3 scripts/oracle_check.py --strategy-sweep "$SWEEP_SF"

echo "CI GREEN"
