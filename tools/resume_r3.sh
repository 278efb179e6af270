#!/bin/bash
# Round-3: resume a v3 retrain run under the segmented supervisor.
#
# Fixes the round-2 advisor findings on launch_v3.sh / winddown_r2d.sh:
#   * set -e semantics: every failure path exits nonzero and loudly;
#   * the run dir must already exist (we are resuming, not launching);
#   * runs as a setsid session leader and records its pid in
#     /tmp/sup_<name>.pid so a winddown script can kill the whole group
#     and verify it actually died.
#
# Usage: resume_r3.sh <name> <total_steps> [segment_steps] [train.py overrides...]
# The overrides are applied (and persisted into the run's config.yaml) by the
# first resume segment; later supervisor segments inherit them from the
# saved config.
set -eu
n=$1; total=$2; seg=${3:-4000}
shift 3 || shift 2
cd "$(dirname "$0")/.."

D=$(ls -dt runs/${n}_v3_* 2>/dev/null | head -1)
[ -n "$D" ] || { echo "resume_r3: no run dir matches runs/${n}_v3_*"; exit 1; }
cur=$(ls "$D/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
cur=${cur:-0}
echo "resume_r3: $D at step $cur -> target $total (segment $seg)"

# first segment applies + persists the CLI overrides
python -u train.py --resume "$D" --max_steps $((cur + seg)) "$@"
exec bash tools/train_supervisor.sh "$D" "$seg" "$total"
