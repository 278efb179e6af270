#!/bin/bash
# Round-3 winddown: stop (or wait out) the v3 retrain supervisors, verify
# they are actually dead, then run the serialized 250-step reference-protocol
# evals and ship each model with its metrics attached.
#
# Fixes the round-2 advisor findings on winddown_r2d.sh:
#   * supervisors are setsid session leaders with pids in /tmp/sup_<n>.pid
#     (written by resume_r3.sh / launch_v3.sh) — the kill targets the whole
#     process group and FAILS LOUDLY when no pid file exists;
#   * after TERM we poll `kill -0 -- -PGID` until the group is gone (120s
#     timeout, then KILL), instead of a blind sleep;
#   * pid files are removed after a confirmed kill so later invocations
#     cannot kill reused pids.
#
# Usage: winddown_r3.sh [--kill] [name ...]     (default names: endpoint
#        dirichlet vf; default mode: wait for supervisors to finish)
set -eu
cd "$(dirname "$0")/.."

KILL=0
if [ "${1:-}" = "--kill" ]; then KILL=1; shift; fi
NAMES=("$@")
[ ${#NAMES[@]} -gt 0 ] || NAMES=(endpoint dirichlet vf)

stop_group() { # $1 = pid file
  local pf=$1 pid
  [ -f "$pf" ] || { echo "winddown: MISSING pid file $pf"; return 1; }
  pid=$(cat "$pf")
  if ! kill -0 -- "-$pid" 2>/dev/null; then
    echo "winddown: group $pid ($pf) already gone"
    rm -f "$pf"
    return 0
  fi
  if [ "$KILL" = 1 ]; then
    echo "winddown: TERM group $pid"
    kill -TERM -- "-$pid" 2>/dev/null || true
  else
    echo "winddown: waiting for group $pid to finish"
  fi
  local t=0 limit=$(( KILL == 1 ? 120 : 14400 ))
  while kill -0 -- "-$pid" 2>/dev/null; do
    sleep 5; t=$((t + 5))
    if [ "$t" -ge "$limit" ]; then
      if [ "$KILL" = 1 ]; then
        echo "winddown: group $pid survived TERM ${limit}s -> KILL"
        kill -KILL -- "-$pid" 2>/dev/null || true
        sleep 5
        kill -0 -- "-$pid" 2>/dev/null && {
          echo "winddown: FAILED to kill group $pid"; return 1; }
        break
      else
        echo "winddown: group $pid still running after ${limit}s"; return 1
      fi
    fi
  done
  rm -f "$pf"
  echo "winddown: group $pid confirmed dead"
}

for n in "${NAMES[@]}"; do
  stop_group "/tmp/sup_${n}.pid"
done

# chip is free now: serialized reference-protocol evals + ship
mkdir -p /tmp/r3_evals
for n in "${NAMES[@]}"; do
  D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
  [ -n "$D" ] || { echo "winddown: no run dir for $n"; exit 1; }
  M=/tmp/r3_evals/${n}_metrics.json
  echo "winddown: evaluating $D (250 steps, n=100, 5 subsets)"
  python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
      --n_subsets 5 --metrics --metrics_file "$M"
  case $n in
    endpoint)  SHIP=qm9_synth_endpoint;;
    dirichlet) SHIP=qm9_synth_dirichlet;;
    vf)        SHIP=qm9_synth_vf;;
    *)         SHIP=qm9_synth_$n;;
  esac
  python tools/ship_model.py "$D" "$SHIP" --metrics_file "$M"
  echo "winddown: shipped $D -> trained_models/$SHIP"
done
echo "winddown: done — update trained_models/readme.md with the new numbers"
