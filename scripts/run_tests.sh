#!/usr/bin/env bash
# Run the test suite one file per process.
#
# Per-file runs are the CACHE BUILDERS: short processes write the XLA
# persistent compilation cache safely, so DRSLAM_TEST_CACHE_WRITES=1 here.
# A plain single-process `pytest tests/` is ALSO supported -- its conftest
# leaves the cache read-only, because XLA:CPU executable serialization
# segfaults late in a long process (jax compilation_cache
# put_executable_and_time; root-caused round 5 -- the crash was never
# cumulative compile state, it is the cache-write path).
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export DRSLAM_TEST_CACHE_WRITES=1

pass=0
fail=0
failed_files=()
for f in tests/test_*.py; do
    echo "=== $f ==="
    if timeout 900 python -m pytest "$f" -q "$@"; then
        pass=$((pass + 1))
    else
        fail=$((fail + 1))
        failed_files+=("$f")
    fi
done

echo
echo "files passed: $pass, files failed: $fail"
if [ "$fail" -ne 0 ]; then
    printf 'FAILED: %s\n' "${failed_files[@]}"
    exit 1
fi
