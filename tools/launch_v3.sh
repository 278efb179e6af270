#!/bin/bash
# Launch a fresh v3 retrain for one parameterization, then hand off to the
# segmented supervisor (tools/train_supervisor.sh) so host-memory growth of
# the remote-accelerator client stays bounded.
#
# Usage: launch_v3.sh <name> <total_steps> [segment_steps]
set -u
n=$1; total=$2; seg=${3:-4000}
cd "$(dirname "$0")/.."
python -u train.py --config "configs/qm9_${n}_v3.yml" --run_name "${n}_v3" \
  --max_steps "$seg"
D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
[ -z "$D" ] && { echo "launch_v3: no run dir created for $n"; exit 1; }
exec bash tools/train_supervisor.sh "$D" "$seg" "$total"
