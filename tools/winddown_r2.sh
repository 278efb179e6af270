#!/bin/bash
# Round-2 wind-down: stop trainings by PID, evaluate latest checkpoints,
# ship good models, re-bench on the idle chip.  Run from the repo root.
set -x
for n in endpoint vf dirichlet geom geom_large; do
  p=/tmp/r2logs/train_${n}.pid
  [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
done
sleep 10
ps aux | grep "[t]rain.py --config" || true

for n in endpoint vf dirichlet; do
  D=$(ls -dt runs/qm9_${n}_v2_* | head -1)
  nohup python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
    --n_subsets 5 --metrics --metrics_file /tmp/r2logs/metrics_${n}.json \
    > /tmp/r2logs/eval_${n}.log 2>&1
done
