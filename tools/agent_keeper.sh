#!/bin/bash
# Keep tools/tpu_agent.py alive for the rest of the round: if its pid file
# goes stale, relaunch it (the new instance pays the session-establishment
# fee once, then serves warm again).  Checks every 2 min; never
# pattern-kills; exits only when killed.
#
# Usage: setsid nohup bash tools/agent_keeper.sh >/tmp/agent_keeper.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
while :; do
  pid=$(cat /tmp/tpu_agent.pid 2>/dev/null || echo "")
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "$(date +%H:%M:%S) agent dead (pid='${pid}'), relaunching"
    setsid nohup python tools/tpu_agent.py >>/tmp/tpu_agent.log 2>&1 &
    sleep 30
  fi
  sleep 120
done
