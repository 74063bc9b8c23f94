#!/usr/bin/env bash
# Full local replica of the driver's gates: compile -> tests -> t2 verify +
# DuckDB compare (sf0.01) -> bench (sf0.1). Exit nonzero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"

echo "== compile + tests =="
sbt -batch compile test

echo "== t2 verify + compare (sf0.01) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v" \
  2>&1 | grep -E '\[verify\]' || true
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_v

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>&1 | grep -E '^\{|\[info\] \{' | sed 's/^\[info\] //'
