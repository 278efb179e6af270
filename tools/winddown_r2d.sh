#!/bin/bash
# Round-2 session-4 wind-down: stop the v3 retrains (endpoint / vf /
# dirichlet) by process group, evaluate the latest checkpoints at the
# standard protocol (n=100, 250 steps, 5 subsets), then ship models that
# clear their bars and re-bench on the idle chip.  Run from the repo root.
set -x
mkdir -p /tmp/r2logs
for n in endpoint vf dirichlet; do
  p=/tmp/sup_${n}.pid
  # launchers run as setsid session leaders; kill the whole process group
  [ -f "$p" ] && kill -- "-$(cat "$p")" 2>/dev/null
done
sleep 15

# evals are serialized: each gets the whole chip
for n in endpoint dirichlet vf; do
  D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
  [ -z "$D" ] && continue
  python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
    --n_subsets 5 --metrics --metrics_file /tmp/r2logs/metrics_${n}_v3.json \
    > /tmp/r2logs/eval_${n}_v3.log 2>&1
done

# ship (quality bars judged by hand from the metrics files):
#   python tools/ship_model.py --run_dir <D> --name qm9_synth_<n> \
#       --metrics_file /tmp/r2logs/metrics_<n>_v3.json
# then update trained_models/readme.md + README.md tables, and re-bench:
#   python bench.py   # idle chip only
