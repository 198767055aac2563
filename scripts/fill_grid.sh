#!/bin/bash
# Fill the 120-name BoxQP suite grid (SURVEY.md section 0.1 / R8) in size
# bands, cheapest first, with the sel_size schedule the round-1 cells used
# (sel 20 at n<=70, 40 at 80-100, 50 at 125).  The runner is incremental:
# completed (instance, strategy, k) cells are skipped, so this script can be
# killed and relaunched at any time and only makes monotonic progress.
set -u
cd "$(dirname "$0")/.."
LOG=results/fill_grid.log
run() {
  echo "[fill_grid] $(date +%T) python scripts/run_suite_incremental.py $*" >> "$LOG"
  python scripts/run_suite_incremental.py "$@" >> "$LOG" 2>&1
}
# band 1: small n, full density x seed grid (fast cells)
run --sizes 20,30,40,50 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 20
# band 1b: k=2 cells (SURVEY.md section 0.3: k in {2,3} for dense BoxQP)
run --sizes 20,30,40,50 --densities 100 --seeds 1 --k 2 --sel-size 20 \
    --strategies neural,feasibility
# band 2: medium n
run --sizes 60,70 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 20
# band 3: large n
run --sizes 80,90,100 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 40
# band 4: n=125
run --sizes 125 --densities 25,50,75,100 --seeds 1,2,3 --sel-size 50
echo "[fill_grid] $(date +%T) ALL BANDS COMPLETE" >> "$LOG"
