#!/usr/bin/env bash
# Full-suite runner — the required verification command.
#
# WHY NOT ONE PROCESS: the XLA CPU client in this image (jax 0.9.0,
# 8 virtual devices) segfaults inside backend_compile_and_load after
# ~140 compilations accumulate in a single process (reproduced twice in
# round 3's review and once in round 4, each time ~the 130-140th test,
# regardless of WHICH test runs there; every file passes in isolation).
# Until the upstream compile-accumulation bug is fixed, the suite runs as
# a few fresh-process groups: every tests/test_*.py file is assigned
# round-robin to one of N_GROUPS pytest invocations, so new test files
# are picked up automatically and no process gets near the crash
# threshold (worst group today compiles ~60 programs).
#
# Usage: bash tests/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

N_GROUPS=4
mapfile -t FILES < <(ls tests/test_*.py | sort)

declare -a GROUPS_LIST
for i in "${!FILES[@]}"; do
    g=$((i % N_GROUPS))
    GROUPS_LIST[g]="${GROUPS_LIST[g]:-} ${FILES[i]}"
done

overall=0
for g in $(seq 0 $((N_GROUPS - 1))); do
    # an empty group would invoke pytest with no file args and collect the
    # WHOLE suite in one process — the ~140-compile segfault mode this
    # runner exists to avoid
    if [ -z "${GROUPS_LIST[g]:-}" ]; then continue; fi
    echo "=== suite group $((g + 1))/${N_GROUPS}:${GROUPS_LIST[g]}"
    # shellcheck disable=SC2086
    python -m pytest -q -x ${GROUPS_LIST[g]} "$@"
    rc=$?
    if [ $rc -ne 0 ]; then
        echo "=== group $((g + 1)) FAILED (rc=$rc)"
        overall=$rc
        break
    fi
done

if [ $overall -eq 0 ]; then
    echo "=== suite OK (${#FILES[@]} files, ${N_GROUPS} process groups)"
else
    echo "=== suite FAILED"
fi
exit $overall
