#!/bin/sh
# Sequential 101-layer flagship measurements, one fresh process per
# (recipe, dtype): the round-3 in-process sweep accumulated relay-side
# HBM allocations across configs and its later f32 ladder rungs hit
# RESOURCE_EXHAUSTED that a fresh process does not reproduce.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/perf101_r2.log}

# bf16 re-verification of the two ADE rows (the first capture's 485 ms
# pspnet101_ade20k_473 is inconsistent with psanet101's 254 ms).
for r in pspnet101_ade20k psanet101_ade20k; do
  PERF_DTYPES=bfloat16 PERF_RECIPES=$r python tool/perf_report.py train >> "$LOG" 2>&1
done

# f32 ladder, fresh process per recipe.
for r in psanet101_ade20k pspnet101_cityscapes psanet101_cityscapes; do
  PERF_DTYPES=float32 PERF_RECIPES=$r python tool/perf_report.py train >> "$LOG" 2>&1
done

# BASELINE config #4: PSPNet101 Cityscapes eval, ss then ms.
PERF_MS_LAYERS=101 PERF_MS_SCALES=1.0 python tool/perf_report.py eval_ms >> "$LOG" 2>&1
PERF_MS_LAYERS=101 python tool/perf_report.py eval_ms >> "$LOG" 2>&1
echo DONE >> "$LOG"
