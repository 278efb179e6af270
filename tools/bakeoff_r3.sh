#!/bin/bash
# Round-3 endpoint recipe bake-off: which training recipe can reach
# reference-class quality for the FlowMol1 endpoint parameterization?
#
# The round-2 evidence says the integrator is correct (oracle tests in
# tests/test_continuous_oracle.py) but the shipped recipe plateaus:
# uniform-simplex priors + cosine hit 0.15 structural validity at 75k
# steps. The FlowMol1 paper's winning representation for categoricals is
# the UNCONSTRAINED Gaussian prior (arXiv:2404.19739; reference
# priors.py:8-16 'gaussian'), which the v2/v3 retrains never used.
#
# Three candidates, 6k steps each, serialized on the one chip:
#   B gauss_cos      gaussian a/c/e priors, cosine schedules (x nu=2)
#   C gauss_lin      gaussian priors, linear schedules
#   D gauss_cos_wae  B + weight_ae (CE class weights 1-p; the low
#                    frac_connected of all three weak models points at the
#                    none-bond class dominating the e loss)
#
# Decision rule: ship the winner as the long endpoint retrain recipe.
set -eu
cd "$(dirname "$0")/.."
STEPS=${1:-6000}

run() { # name config extra-args...
  local n=$1 cfg=$2; shift 2
  echo "=== bakeoff: $n ($STEPS steps) ==="
  python -u train.py --config "$cfg" --run_name "$n" --max_steps "$STEPS" "$@"
  local D
  D=$(ls -dt runs/${n}_* | head -1)
  python -u test.py --model_dir "$D" --n_mols 100 --n_timesteps 250 \
      --metrics --metrics_file "/tmp/bake_${n}.json" || true
  python - "$n" "/tmp/bake_${n}.json" <<'EOF'
import json, sys
m = json.load(open(sys.argv[2]))
keys = [k for k in ("frac_valid_mols_structural", "frac_valid_mols",
                    "frac_atoms_stable", "frac_mols_stable_valence",
                    "frac_connected") if k in m]
print("BAKEOFF", sys.argv[1], {k: round(m[k], 3) for k in keys})
EOF
}

run bake_ep_gauss_cos configs/bake_ep_gauss_cos.yml
run bake_ep_gauss_lin configs/bake_ep_gauss_lin.yml
run bake_ep_gauss_cos_wae configs/bake_ep_gauss_cos.yml --weight_ae 1
echo "=== bakeoff done ==="
