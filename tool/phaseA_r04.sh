#!/bin/sh
# Round-4 TPU measurement chain, strictly sequential (1-core host, all
# timing-sensitive): (1) validate the weather-proofed bench end-to-end
# on the chip and capture the post-channels-first ss headline;
# (2) re-measure Cityscapes ms eval (VERDICT item 5 target >=0.85
# img/s); (3) the 101-layer flagship ladder (VERDICT item 2).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/phaseA_r04.log}

python bench.py > /tmp/bench_r04_builder.json 2>> "$LOG"
echo "=== bench done ===" >> "$LOG"
cat /tmp/bench_r04_builder.json >> "$LOG"

python tool/perf_report.py eval_ms >> "$LOG" 2>&1
echo "=== eval_ms 50 done ===" >> "$LOG"

# bf16 re-verification of the two ADE 101 rows, fresh process each.
for r in pspnet101_ade20k psanet101_ade20k; do
  PERF_DTYPES=bfloat16 PERF_RECIPES=$r python tool/perf_report.py train >> "$LOG" 2>&1
done
# bf16 Cityscapes 101 rows (the flagship BASELINE #4 family).
for r in pspnet101_cityscapes psanet101_cityscapes; do
  PERF_DTYPES=bfloat16 PERF_RECIPES=$r python tool/perf_report.py train >> "$LOG" 2>&1
done
# f32 ladder, fresh process per recipe.
for r in pspnet101_ade20k psanet101_ade20k pspnet101_cityscapes psanet101_cityscapes; do
  PERF_DTYPES=float32 PERF_RECIPES=$r python tool/perf_report.py train >> "$LOG" 2>&1
done

# BASELINE config #4: PSPNet101 Cityscapes eval, ss then ms.
PERF_MS_LAYERS=101 PERF_MS_SCALES=1.0 python tool/perf_report.py eval_ms >> "$LOG" 2>&1
PERF_MS_LAYERS=101 python tool/perf_report.py eval_ms >> "$LOG" 2>&1
echo DONE >> "$LOG"
