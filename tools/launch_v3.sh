#!/bin/bash
# Launch a fresh v3 retrain for one parameterization, then hand off to the
# segmented supervisor (tools/train_supervisor.sh) so host-memory growth of
# the remote-accelerator client stays bounded.
#
# Contract (round-2 advisor findings):
#   * set -eu — every failure path exits nonzero;
#   * the first segment must CREATE a new run dir (newer than the launch
#     timestamp) or we fail loudly instead of adopting a stale one;
#   * the supervisor runs as a setsid session leader with its pid in
#     /tmp/sup_<name>.pid so tools/winddown_r3.sh can stop it by group and
#     verify it actually died.
#
# Usage: launch_v3.sh <name> <total_steps> [segment_steps] [train.py overrides...]
set -eu
n=$1; total=$2; seg=${3:-4000}
shift 3 2>/dev/null || shift 2
cd "$(dirname "$0")/.."

stamp=$(date +%s)
python -u train.py --config "configs/qm9_${n}_v3.yml" --run_name "${n}_v3" \
  --max_steps "$seg" "$@"
D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
[ -n "$D" ] || { echo "launch_v3: train.py created no run dir for $n"; exit 1; }
born=$(stat -c %Y "$D")
[ "$born" -ge "$stamp" ] || {
  echo "launch_v3: newest dir $D predates this launch"; exit 1; }

setsid bash tools/train_supervisor.sh "$D" "$seg" "$total" \
    > "$D/supervisor.log" 2>&1 &
echo $! > "/tmp/sup_${n}.pid"
echo "launch_v3: supervising $D to $total steps (pid $(cat /tmp/sup_${n}.pid))"
