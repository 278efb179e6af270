#!/bin/bash
# Round-3 winddown: stop (or wait out) the training supervisors, verify
# they are actually dead, then run the serialized 250-step reference-protocol
# evals and ship each model with its metrics attached.
#
# Advisor contract (round-2 findings on winddown_r2d.sh):
#   * supervisors are setsid session leaders with pids in /tmp/sup_<n>.pid
#     — the kill targets the whole process group and FAILS LOUDLY when no
#     pid file exists;
#   * after TERM we poll `kill -0 -- -PGID` until the group is gone (120s
#     timeout, then KILL), instead of a blind sleep;
#   * pid files are removed after a confirmed kill so later invocations
#     cannot kill reused pids.
#
# Runs are declared in a manifest (default /tmp/r3_runs.tsv), one line per
# run:   <name> <run_dir> <ship_name>
# written by the launch commands.  <name> keys the pid file /tmp/sup_<name>.pid.
#
# Usage: winddown_r3.sh [--kill] [--manifest FILE] [name ...]
#        (default: every run in the manifest; default mode: wait)
set -eu
cd "$(dirname "$0")/.."

KILL=0
MANIFEST=/tmp/r3_runs.tsv
while [ $# -gt 0 ]; do
  case $1 in
    --kill) KILL=1; shift;;
    --manifest) MANIFEST=$2; shift 2;;
    *) break;;
  esac
done
[ -f "$MANIFEST" ] || { echo "winddown: no manifest $MANIFEST"; exit 1; }
ONLY=("$@")

want() { # is $1 in ONLY (or ONLY empty)?
  [ ${#ONLY[@]} -eq 0 ] && return 0
  local x; for x in "${ONLY[@]}"; do [ "$x" = "$1" ] && return 0; done
  return 1
}

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

# phase 1: stop every requested supervisor
while IFS=$'\t' read -r n D SHIP; do
  [ -n "$n" ] || continue
  want "$n" || continue
  stop_group "/tmp/sup_${n}.pid"
done < "$MANIFEST"

# phase 2: chip is free — serialized reference-protocol evals + ship
mkdir -p /tmp/r3_evals
while IFS=$'\t' read -r n D SHIP; do
  [ -n "$n" ] || continue
  want "$n" || continue
  [ -d "$D" ] || { echo "winddown: no run dir $D for $n"; exit 1; }
  M=/tmp/r3_evals/${n}_metrics.json
  echo "winddown: evaluating $D (250 steps, n=100, 5 subsets)"
  python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
      --n_subsets 5 --metrics --metrics_file "$M"
  python tools/ship_model.py "$D" "$SHIP" --metrics_file "$M"
  echo "winddown: shipped $D -> trained_models/$SHIP"
done < "$MANIFEST"
echo "winddown: done — update trained_models/readme.md with the new numbers"
