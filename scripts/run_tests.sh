#!/usr/bin/env bash
# Test runner with one retry for the known XLA:CPU oversubscription abort
# (NOTES.md: rare bare "Fatal Python error: Aborted" on the 1-core container,
# not code-correlated).  A genuine test failure is NOT retried.
set -uo pipefail

PY="${PY:-python}"
LOG=$(mktemp /tmp/pytest_out.XXXXXX)
trap 'rm -f "$LOG"' EXIT

"$PY" -m pytest tests/ -x -q -p no:cacheprovider "$@" 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ] && grep -q "Fatal Python error: Aborted" "$LOG"; then
    echo "== retrying once after known XLA:CPU abort flake =="
    exec "$PY" -m pytest tests/ -x -q -p no:cacheprovider "$@"
fi
exit "$rc"
