#!/usr/bin/env python
"""Benchmark: molecules/sec/chip at 250-step GEOM sampling (north-star metric
from BASELINE.md), measured with the flowmol3 architecture.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Sampling throughput is weight-independent (the compute graph is identical for
random or trained weights), so this benchmarks the production sampling path —
the 250-step lax.scan CTMC integrator over the full flowmol3 network — with
molecule sizes drawn from the real GEOM-drugs n-atoms histogram.

`vs_baseline`: the reference repo publishes no numbers (BASELINE.md); we pin
an assumed A100/PyTorch reference of 1.0 mol/s for 250-step GEOM sampling at
batch 128 (the reference's own default protocol, test.py:23-30) so the ratio
is traceable; revise when a measured reference number exists.
"""

import json
import time

ASSUMED_A100_REFERENCE_MOLS_PER_SEC = 1.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import model_from_config, read_config_file
    from flowmol_tpu.data.stats import NAtomsDistribution

    config = read_config_file("configs/flowmol3.yml")
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))

    hist = NAtomsDistribution.load(
        "assets/data/geom_full_kekulized/train_data_n_atoms_histogram.npz")
    rng = np.random.default_rng(0)

    n_mols = 96
    n_timesteps = 250
    sizes = hist.sample(rng, n_mols)
    # one padded batch; GEOM molecules are ~44 atoms median, ~181 max
    n_pad = int(np.ceil(sizes.max() / 16) * 16)
    node_mask = np.arange(n_pad)[None, :] < sizes[:, None]
    node_mask = jnp.asarray(node_mask)

    fn = jax.jit(model.make_sample_fn(n_timesteps=n_timesteps))

    def run(key):
        out = fn(params, key, node_mask)
        # force device->host transfer: block_until_ready does not reliably
        # synchronize on the remote-TPU (axon) platform
        return {k: np.asarray(v) for k, v in out.items()}

    # compile + warmup (excluded from timing)
    run(jax.random.PRNGKey(1))

    t0 = time.time()
    run(jax.random.PRNGKey(2))
    dt = time.time() - t0

    mols_per_sec = n_mols / dt
    n_chips = 1  # bench runs on one chip
    value = mols_per_sec / n_chips
    print(json.dumps({
        "metric": "geom_sampling_mols_per_sec_per_chip",
        "value": round(value, 4),
        "unit": "molecules/sec/chip (250-step CTMC sampling, flowmol3 arch)",
        "vs_baseline": round(value / ASSUMED_A100_REFERENCE_MOLS_PER_SEC, 4),
        "n_mols": n_mols,
        "n_timesteps": n_timesteps,
        "n_pad": int(n_pad),
        "wall_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
