#!/usr/bin/env bash
# Runs the full ScalaTest suite and writes TESTS_r<N>.json (pass/fail
# counts + exit code) so the round snapshot carries the suite state
# instead of the judge re-running 12 minutes of tests to discover it.
# Usage: tools/run_tests.sh <round>   (e.g. tools/run_tests.sh 11)
set -uo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: run_tests.sh <round>}"
LOG=$(mktemp)
sbt -batch test 2>&1 | tee "$LOG"
CODE=${PIPESTATUS[0]}
# sbt/ScalaTest summary: "Tests: succeeded 278, failed 0, canceled 0, ignored 0, pending 0"
SUCC=$(grep -oE 'Tests: succeeded [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+' || echo 0)
FAIL=$(grep -oE ', failed [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+' || echo -1)
SUITES=$(grep -cE '^\[info\] [A-Za-z]+Spec:$' "$LOG" || true)
# NOTE: no -o on the header grep — GNU grep suppresses -A context lines
# when -o is given, which would leave the name-extraction grep nothing
# to match and failed_suites always empty (r11 ADVICE).
FAILED_NAMES=$(grep -E -A 40 '^\[error\] Failed tests:' "$LOG" 2>/dev/null \
  | grep -oE 'graft\.[A-Za-z]+' | sort -u | paste -sd, - || true)
printf '{"round":%s,"exit_code":%s,"suites":%s,"passed":%s,"failed":%s,"failed_suites":"%s"}\n' \
  "$ROUND" "$CODE" "$SUITES" "$SUCC" "$FAIL" "$FAILED_NAMES" > "TESTS_r${ROUND}.json"
cat "TESTS_r${ROUND}.json"
rm -f "$LOG"
exit "$CODE"
