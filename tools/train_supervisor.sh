#!/bin/bash
# Segmented-training supervisor: run `train.py --resume` in bounded step
# segments, restarting the process between segments (and after crashes/OOM
# kills) from the latest orbax checkpoint.
#
# Why: the remote-attached accelerator client leaks host memory per dispatch
# (~GB/hour at qm9 scale); a multi-hour training in one process is
# eventually OOM-killed by the kernel.  Bounding each process's lifetime to
# one segment caps its memory, and the run-dir checkpoint contract makes the
# restart exact (state/EMA/opt/step all resume).
#
# Usage: train_supervisor.sh <run_dir> <segment_steps> <total_steps>
set -u
D=$1; segment=${2:-3000}; total=${3:-60000}
[ -d "$D" ] || { echo "no run dir: $D"; exit 1; }
stall=0
while :; do
  cur=$(ls "$D/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  cur=${cur:-0}
  if [ "$cur" -ge "$total" ]; then echo "supervisor: $D reached $cur >= $total"; break; fi
  next=$((cur + segment)); [ "$next" -gt "$total" ] && next=$total
  echo "supervisor: $D resuming at step $cur, segment target $next"
  python -u train.py --resume "$D" --max_steps "$next"
  rc=$?
  new=$(ls "$D/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  new=${new:-0}
  if [ "$new" -le "$cur" ]; then
    stall=$((stall + 1))
    if [ "$stall" -ge 5 ]; then echo "supervisor: no progress after 5 attempts (rc=$rc), giving up"; exit 1; fi
    sleep 30
  else
    stall=0
  fi
  sleep 5
done
