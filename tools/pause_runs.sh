#!/bin/bash
# Pause/resume all supervised training runs so benchmarks on the shared
# single-chip TPU are not contended.  Walks explicit pid trees from the
# /tmp/sup_<name>.pid files (never pattern-kills).
#
# Usage: pause_runs.sh stop|cont
set -u
sig=${1:?usage: pause_runs.sh stop|cont}
case "$sig" in
  stop) SIG=STOP ;;
  cont) SIG=CONT ;;
  *) echo "usage: pause_runs.sh stop|cont"; exit 1 ;;
esac

descend() {  # echo pid and all descendants
  local p=$1
  echo "$p"
  local kids
  kids=$(cat /proc/"$p"/task/*/children 2>/dev/null)
  local k
  for k in $kids; do descend "$k"; done
}

for f in /tmp/sup_*.pid; do
  [ -f "$f" ] || continue
  root=$(cat "$f")
  [ -d "/proc/$root" ] || continue
  for p in $(descend "$root"); do
    kill -"$SIG" "$p" 2>/dev/null && echo "$SIG $p" || true
  done
done
