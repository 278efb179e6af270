#!/bin/bash
# Round-2 session-2 wind-down: stop v3 trainings by PID, evaluate the latest
# checkpoints at the standard protocol (n=100, 250 steps, 5 subsets), ship
# models whose metrics clear their bars, then re-bench on the idle chip.
# Run from the repo root.
set -x
mkdir -p /tmp/r2logs
for n in endpoint dirichlet vf geom; do
  p=/tmp/train_${n}_v3.pid
  [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
  p=/tmp/train_${n}.pid
  [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
done
sleep 10

for n in endpoint dirichlet vf; do
  D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
  [ -z "$D" ] && continue
  nohup python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
    --n_subsets 5 --metrics --metrics_file /tmp/r2logs/metrics_${n}_v3.json \
    > /tmp/r2logs/eval_${n}_v3.log 2>&1
done

# ship: tools/ship_model.py --run_dir <D> --name qm9_synth_<n> \
#         --metrics_file /tmp/r2logs/metrics_<n>_v3.json
# then: python bench.py > BENCH_local.json  (idle chip only)
