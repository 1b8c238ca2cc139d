#!/bin/bash
# Regenerate the test-count lines in CLAUDE.md and README.md from actual
# `sbt test` output, so the docs can never drift from reality (round-5
# verdict item 7). Usage:
#   tools/sync_test_counts.sh            # runs sbt test, then rewrites docs
#   tools/sync_test_counts.sh <logfile>  # parse an existing sbt test log
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ $# -ge 1 ]]; then
  LOG="$1"
else
  LOG=$(mktemp)
  sbt -batch test >"$LOG" 2>&1 || { tail -20 "$LOG"; exit 1; }
fi

TESTS=$(grep -oE 'Total number of tests run: [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+')
SUITES=$(grep -oE 'Suites: completed [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+')
[[ -n "$TESTS" && -n "$SUITES" ]] || { echo "could not parse counts from $LOG"; exit 1; }

sed -i -E "s/[0-9]+ ScalaTest tests across [0-9]+ suites/$TESTS ScalaTest tests across $SUITES suites/" CLAUDE.md
sed -i -E "s/[0-9]+ ScalaTest specs across [0-9]+ suites/$TESTS ScalaTest specs across $SUITES suites/" README.md
echo "synced: $TESTS tests, $SUITES suites"
