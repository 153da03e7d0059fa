#!/usr/bin/env bash
# Reproducible full-suite test gate (VERDICT r4 item 7): run pytest
# with a hard timeout and tee the COMPLETE output — including the
# summary line — to a committed artifact, so the suite result survives
# process reaping the way ORACLE_FULL_r*.log does.
#
# Usage: tools/run_tests.sh [logfile]   (default PYTEST_run.log)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG="${1:-PYTEST_run.log}"
TIMEOUT="${PYTEST_TIMEOUT_SECS:-3600}"

# NOTE: pytest.ini already sets -q; passing -q again would make it
# -qq, which SUPPRESSES the final summary line — the very thing this
# script exists to capture.
timeout "$TIMEOUT" python -m pytest tests/ --tb=short 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
if [ "$rc" -eq 124 ]; then
    echo "TIMEOUT after ${TIMEOUT}s" | tee -a "$LOG"
fi
echo "exit_code=$rc" | tee -a "$LOG"
exit "$rc"
