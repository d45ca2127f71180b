#!/bin/sh
# Round-4 convergence band widening (VERDICT item 6), strictly
# sequential (1-core host): PSANet torch arm at the full 300-step
# horizon for seeds 0-1 (round 3 had only a 50-step seed-0 arm), then
# PSPNet seeds 3-4 (5-seed band with the carried r03 seeds 0-2), then
# both band summaries. Each seed appends to CONVERGENCE_r04.jsonl as it
# finishes, so partial progress persists.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/conv_r04.log}

python tool/convergence_cross.py 300 --arch psa --seed 0 >> "$LOG" 2>&1
python tool/convergence_cross.py 300 --arch psa --seed 1 >> "$LOG" 2>&1
python tool/convergence_cross.py 300 --arch psp --seed 3 >> "$LOG" 2>&1
python tool/convergence_cross.py 300 --arch psp --seed 4 >> "$LOG" 2>&1
python tool/convergence_cross.py --band --arch psa >> "$LOG" 2>&1
python tool/convergence_cross.py --band --arch psp >> "$LOG" 2>&1
echo DONE >> "$LOG"
