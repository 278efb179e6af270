#!/bin/bash
# Extend a FINISHED round-3 run past its stored epoch budget under the
# segmented supervisor (the run hit max_epochs; give it a bigger budget and
# keep training).  Same advisor contract as launch_r3.sh / resume_r3.sh:
# set -eu, setsid session leader, pid in /tmp/sup_<name>.pid, manifest row
# preserved in /tmp/r3_runs.tsv.
#
# Usage: extend_r3.sh <name> <run_dir> <ship_name> <total_steps> <max_epochs> [segment]
set -eu
n=$1; D=$2; ship=$3; total=$4; epochs=$5; seg=${6:-4000}
cd "$(dirname "$0")/.."
[ -d "$D" ] || { echo "extend_r3: no run dir $D"; exit 1; }
if [ -f "/tmp/sup_${n}.pid" ]; then
  echo "extend_r3: /tmp/sup_${n}.pid exists — wind down '$n' first"; exit 1
fi
cur=$(ls "$D/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
cur=${cur:-0}
echo "extend_r3: $D at step $cur -> target $total (max_epochs $epochs)"

# first segment applies + persists the raised epoch budget (train.py resume
# semantics: CLI flags win over the stored config and are re-saved), then the
# plain supervisor inherits it from the saved config for later segments
setsid bash -c "
  python -u train.py --resume '$D' --max_steps $((cur + seg)) \
      --max_epochs $epochs >> '$D/supervisor.log' 2>&1 &&
  exec bash tools/train_supervisor.sh '$D' '$seg' '$total' \
      >> '$D/supervisor.log' 2>&1
" &
echo $! > "/tmp/sup_${n}.pid"
grep -v "^${n}	" /tmp/r3_runs.tsv 2>/dev/null > /tmp/r3_runs.tsv.new || true
printf '%s\t%s\t%s\n' "$n" "$D" "$ship" >> /tmp/r3_runs.tsv.new
mv /tmp/r3_runs.tsv.new /tmp/r3_runs.tsv
echo "extend_r3: supervising $D to $total steps (pid $(cat /tmp/sup_${n}.pid))"
