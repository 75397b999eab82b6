#!/usr/bin/env bash
# Flake-detection repeat harness, mirroring the reference's
# test-mr-many.sh (/root/reference/src/main/test-mr-many.sh:15-22): run
# the nondeterminism-sensitive suites N times and stop at the first
# failure. Targets the fault-injection, streaming-equivalence, and
# linearizability tests — the ones whose bugs are schedule-dependent.
#
# Usage: tools/repeat.sh [N]   (default 10)
set -u -o pipefail
N="${1:-10}"
cd "$(dirname "$0")/.."
SUITES="tests/test_fault_tolerance.py tests/test_streaming_faults.py \
tests/test_streaming.py tests/test_streaming3.py tests/test_linearizability.py"
for i in $(seq 1 "$N"); do
  echo "=== repeat $i/$N ==="
  if ! python -m pytest $SUITES -q -p no:cacheprovider 2>&1 | tail -1; then
    echo "FAILED on iteration $i"
    exit 1
  fi
done
echo "PASSED ${N}x"
