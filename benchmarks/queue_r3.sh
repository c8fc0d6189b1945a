#!/bin/bash
# Round-3 TPU queue: the tunnel admits ONE client at a time, so every
# TPU-bound pass runs strictly serially. Usage: queue_r3.sh <pid-to-wait-on>
set -u
cd "$(dirname "$0")/.."
if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
bash benchmarks/fill_grid7.sh
bash benchmarks/fill_grid8.sh
echo "queue_r3 complete"
