#!/bin/sh
# Round-4 Phase A2: ms-eval attribution AFTER the channels-first stitch
# commit (the pre-fix ladder is what justified it; this records where
# the time actually went), a clean-weather eval_ms re-run, and the
# bucketed-pipeline transfer measurement (upload bytes/image after the
# separable-count/cached-matrix optimizations).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/phaseA2_r04.log}

python tool/ms_attrib.py >> "$LOG" 2>&1
echo "=== ms_attrib done ===" >> "$LOG"

python tool/perf_report.py eval_ms >> "$LOG" 2>&1
echo "=== eval_ms 50 rerun done ===" >> "$LOG"

python tool/perf_report.py eval >> "$LOG" 2>&1
echo DONE >> "$LOG"
