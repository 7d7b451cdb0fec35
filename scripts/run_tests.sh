#!/usr/bin/env bash
# Run the test suite one file per process.
#
# Rationale: the suite compiles hundreds of XLA CPU executables; run as a
# single process the cumulative compile state eventually segfaults inside
# backend_compile_and_load (~test 120), masking any real failures in the
# tail (VERDICT r03 "What's weak" #3). Per-file processes bound the compile
# cache per process and make every test's verdict observable.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

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
