#!/usr/bin/env python
"""Measure sampler device time vs (batch, bucket) on the flowmol3 arch.

Motivation (r2): overlapped and device-only sampling throughput are equal
(bench.py), i.e. the chip is the bottleneck at ~0.1% MFU — so the question
is whether per-scan-step time is dominated by FLOPs (then finer buckets /
exact batches win) or by fixed per-step overhead (then fewer, larger batches
win).  This prints ms/step and mols/s for a grid of (bucket, batch) points.

Usage: python tools/bench_batch_scaling.py [--nt 250] [--reps 2]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=250)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--points", type=str,
                    default="32:1,32:16,32:64,32:128,48:32,96:1,96:16,96:64,"
                            "192:1,192:8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flowmol_tpu.api import model_from_config, read_config_file

    config = read_config_file("configs/flowmol3.yml")
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))

    points = [tuple(map(int, p.split(":"))) for p in args.points.split(",")]
    results = []
    for n_pad, bsz in points:
        fn = jax.jit(model.make_sample_fn(n_timesteps=args.nt))
        # molecules filling ~80% of the bucket (typical padding waste)
        sizes = np.full(bsz, max(int(n_pad * 0.85), 2))
        nm = jnp.asarray(np.arange(n_pad)[None, :] < sizes[:, None])
        out = fn(params, jax.random.PRNGKey(1), nm)  # compile + warm
        jax.tree.map(np.asarray, out)
        t0 = time.time()
        outs = [fn(params, jax.random.PRNGKey(2 + r), nm)
                for r in range(args.reps)]
        jax.tree.map(np.asarray, outs[-1])
        dt = (time.time() - t0) / args.reps
        ms_step = 1e3 * dt / (args.nt - 1)
        row = {"bucket": n_pad, "batch": bsz,
               "ms_per_step": round(ms_step, 3),
               "mols_per_sec": round(bsz / dt, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
