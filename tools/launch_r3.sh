#!/bin/bash
# Launch one round-3 training (fresh run) under the segmented supervisor and
# register it in the winddown manifest (/tmp/r3_runs.tsv).
#
# Advisor contract: set -eu; the first segment must CREATE a run dir newer
# than the launch timestamp; the supervisor is a setsid session leader with
# its pid in /tmp/sup_<name>.pid.
#
# Usage: launch_r3.sh <name> <config> <ship_name> <total_steps> [segment] [overrides...]
set -eu
n=$1; cfg=$2; ship=$3; total=$4; seg=${5:-5000}
shift 5 2>/dev/null || shift 4
cd "$(dirname "$0")/.."

stamp=$(date +%s)
python -u train.py --config "$cfg" --run_name "$n" --max_steps "$seg" "$@"
D=$(ls -dt runs/${n}_* 2>/dev/null | head -1)
[ -n "$D" ] || { echo "launch_r3: train.py created no run dir for $n"; exit 1; }
born=$(stat -c %Y "$D")
[ "$born" -ge "$stamp" ] || {
  echo "launch_r3: newest dir $D predates this launch"; exit 1; }

setsid bash tools/train_supervisor.sh "$D" "$seg" "$total" \
    > "$D/supervisor.log" 2>&1 &
echo $! > "/tmp/sup_${n}.pid"
grep -v "^${n}	" /tmp/r3_runs.tsv 2>/dev/null > /tmp/r3_runs.tsv.new || true
printf '%s\t%s\t%s\n' "$n" "$D" "$ship" >> /tmp/r3_runs.tsv.new
mv /tmp/r3_runs.tsv.new /tmp/r3_runs.tsv
echo "launch_r3: supervising $D to $total steps (pid $(cat /tmp/sup_${n}.pid))"
