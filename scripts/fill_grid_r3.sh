#!/bin/bash
# Round-3 completion of the 120-name BoxQP grid (SURVEY.md §0.1 / R8).
# Remaining after round 2: the 19 instances at n=100/125 (seeds 2-3 plus
# density 75 and spar125-25-1).  The incremental runner skips completed
# (instance, strategy, k) cells, so this script is kill-and-relaunch safe.
set -u
cd "$(dirname "$0")/.."
LOG=results/fill_grid.log
run() {
  echo "[fill_grid_r3] $(date +%T) python scripts/run_suite_incremental.py $*" >> "$LOG"
  python scripts/run_suite_incremental.py "$@" >> "$LOG" 2>&1
}
# band A: n=100 (all densities x seeds)
run --sizes 100 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 40 \
    --strategies neural,feasibility
# band B: n=125
run --sizes 125 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 50 \
    --strategies neural,feasibility
# band C: random control at large n (completes the 3-strategy picture there)
run --sizes 100,125 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 40 \
    --strategies random
echo "[fill_grid_r3] $(date +%T) ALL BANDS COMPLETE" >> "$LOG"
