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

    # (persistent XLA compilation cache is configured at package import —
    # flowmol_tpu/__init__.py — so the ~10 per-bucket programs compile once
    # across bench invocations)
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

    # size-bucketed sampling: pad each molecule to its bucket, not the batch
    # max — O(N^2) pairwise compute makes padding waste quadratic
    from flowmol_tpu.api import SAMPLING_BUCKETS
    buckets = SAMPLING_BUCKETS
    fn = jax.jit(model.make_sample_fn(n_timesteps=n_timesteps))

    def bucketize(szs):
        groups = {}
        for s in szs:
            b = next(x for x in buckets if s <= x)
            groups.setdefault(b, []).append(int(s))
        return groups

    def run(key, groups):
        outs = []
        for i, (n_pad, szs) in enumerate(sorted(groups.items())):
            node_mask = jnp.asarray(
                np.arange(n_pad)[None, :] < np.asarray(szs)[:, None])
            out = fn(params, jax.random.fold_in(key, i), node_mask)
            # force device->host transfer: block_until_ready does not
            # reliably synchronize on the remote-TPU (axon) platform
            outs.append({k: np.asarray(v) for k, v in out.items()})
        return outs

    groups = bucketize(sizes)
    # compile + warmup (excluded from timing)
    run(jax.random.PRNGKey(1), groups)

    t0 = time.time()
    run(jax.random.PRNGKey(2), groups)
    dt = time.time() - t0

    mols_per_sec = n_mols / dt
    n_chips = 1  # bench runs on one chip
    value = mols_per_sec / n_chips

    train_sps = _bench_train_throughput()

    print(json.dumps({
        "metric": "geom_sampling_mols_per_sec_per_chip",
        "value": round(value, 4),
        "unit": "molecules/sec/chip (250-step CTMC sampling, flowmol3 arch)",
        "vs_baseline": round(value / ASSUMED_A100_REFERENCE_MOLS_PER_SEC, 4),
        "n_mols": n_mols,
        "n_timesteps": n_timesteps,
        "buckets": {str(k): len(v) for k, v in sorted(groups.items())},
        "wall_s": round(dt, 3),
        "qm9_train_samples_per_sec_per_chip": train_sps,
    }))


def _bench_train_throughput(n_steps: int = 20):
    """Secondary north-star: QM9-scale train samples/sec/chip (dev config
    arch, synthetic qm9-sized molecules, edge-budget batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import model_from_config, read_config_file
    from flowmol_tpu.data.dataset import DataConfig, pad_batch, prepare_molecule
    from flowmol_tpu.data.synthetic import generate_molecule
    from flowmol_tpu.train_utils.optim import LRScheduleConfig
    from flowmol_tpu.train_utils.step import create_train_state, make_train_step

    config = read_config_file("configs/dev.yml")
    model = model_from_config(config)
    cfg = model.cfg
    lr_cfg = LRScheduleConfig()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr_cfg, 0.999)
    step = jax.jit(make_train_step(model, tx, lr_cfg, 0.999))

    rng = np.random.default_rng(0)
    prior_cfg = (config["mol_fm"]["prior_config"])
    dc = DataConfig(prior_config=prior_cfg, n_atom_types=cfg.n_atom_types,
                    n_bond_types=cfg.n_bond_types,
                    fake_atom_p=cfg.fake_atom_p, is_ctmc=cfg.is_ctmc)
    mols = []
    for _ in range(24):
        x, a, c, bonds, bts = generate_molecule(
            rng, int(rng.integers(12, 26)), len(cfg.atom_type_map))
        adj = np.zeros((x.shape[0], x.shape[0]), np.int32)
        adj[bonds[:, 0], bonds[:, 1]] = bts
        mols.append(prepare_molecule(
            rng, {"x": x, "a": a, "c": c, "adj": np.maximum(adj, adj.T)}, dc))
    batch = jax.tree.map(jnp.asarray, pad_batch(mols, 32))

    # warmup/compile
    st, m = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(0.0))
    float(np.asarray(m["total_train_loss"]))
    t0 = time.time()
    for i in range(n_steps):
        st, m = step(st, batch, jax.random.PRNGKey(2 + i), jnp.asarray(0.0))
    float(np.asarray(m["total_train_loss"]))  # sync
    dt = time.time() - t0
    return round(n_steps * len(mols) / dt, 2)


if __name__ == "__main__":
    main()
