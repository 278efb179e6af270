#!/bin/bash
# Launch the GEOM-scale flagship training (configs/geom_synth_v3.yml:
# flowmol3 architecture on the synthetic GEOM-sized dataset) under the
# segmented supervisor.
#
# Contract (round-2 advisor findings on launch_v3.sh):
#   * set -eu — every failure path exits nonzero;
#   * the first segment must CREATE a new run dir (newer than the launch
#     timestamp) or we fail loudly instead of adopting a stale one;
#   * the supervisor runs as a setsid session leader with its pid in
#     /tmp/sup_geom.pid so tools/winddown_r3.sh can stop it by group and
#     verify it actually died.
#
# Usage: launch_geom_v3.sh <total_steps> [segment_steps]
set -eu
total=${1:?usage: launch_geom_v3.sh <total_steps> [segment_steps]}
seg=${2:-3000}
cd "$(dirname "$0")/.."

stamp=$(date +%s)
python -u train.py --config configs/geom_synth_v3.yml --max_steps "$seg"
D=$(ls -dt runs/geom_synth_v3_* 2>/dev/null | head -1)
[ -n "$D" ] || { echo "launch_geom_v3: train.py created no run dir"; exit 1; }
born=$(stat -c %Y "$D")
[ "$born" -ge "$stamp" ] || {
  echo "launch_geom_v3: newest dir $D predates this launch"; exit 1; }

setsid bash tools/train_supervisor.sh "$D" "$seg" "$total" \
    > "$D/supervisor.log" 2>&1 &
echo $! > /tmp/sup_geom.pid
echo "launch_geom_v3: supervising $D to $total steps (pid $(cat /tmp/sup_geom.pid))"
