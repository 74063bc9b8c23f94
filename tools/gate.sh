#!/usr/bin/env bash
# Full local replica of the driver's gates: compile -> tests -> t2 verify +
# DuckDB compare + oracle type lint (sf0.01) -> bench (sf0.1). Exit nonzero
# on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"

echo "== compile + tests =="
sbt -batch compile test

echo "== t2 verify + compare + lint (sf0.01) =="
# fresh out dir: a stale per-query dir from a previous run would let
# compare.py validate output the current code can no longer produce
rm -rf /tmp/gate_v
VERIFY_LOG=$(mktemp)
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v" \
  2>&1 | tee "$VERIFY_LOG" | grep -E '\[verify\]' || true
# a '[verify] <key> failed:' line means a query THREW — compare.py would
# only see the missing dir; fail loudly here with the exception text
if grep -q '\[verify\].*failed' "$VERIFY_LOG"; then
  echo "GATE FAIL: query exception(s) during Verify:" >&2
  grep '\[verify\].*failed' "$VERIFY_LOG" >&2
  exit 1
fi
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_v
python3 tools/oracle_lint.py /root/testdata/sf0.01 /tmp/gate_v

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>&1 | grep -E '^\{|\[info\] \{' | sed 's/^\[info\] //'
