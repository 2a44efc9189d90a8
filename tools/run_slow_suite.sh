#!/usr/bin/env bash
# Nightly / pre-release runner for the slow test tier.
#
# Runs each test file in its OWN pytest process: a single long-lived
# process accumulating hundreds of XLA:CPU executables has been observed
# to segfault inside the XLA compiler (crash in backend_compile after
# ~25 slow tests, not reproducible standalone); per-file isolation sides
# with robustness over a little collection overhead.
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
    n=$(python -m pytest "$f" -q -m slow --collect-only 2>/dev/null \
        | awk -F': ' '/^tests\//{s+=$2} END{print s+0}')
    [ "$n" = "0" ] && continue
    echo "=== $f ($n slow tests) ==="
    python -m pytest "$f" -q -m slow || rc=1
done
exit $rc
