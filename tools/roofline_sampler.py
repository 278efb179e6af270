#!/usr/bin/env python
"""Roofline analysis of the packed GEOM sampler (VERDICT r2 item 1).

For each dispatch of the tiered packed plan on the reference protocol draw
(n=100 from the GEOM size histogram, 250 steps, /root/reference/test.py:23-30)
this compiles the sampler, pulls FLOPs and HBM bytes from XLA cost analysis,
computes the v5e roofline bounds, and compares with measured wall time:

    t_mxu  = flops / peak_flops          (bf16 MXU bound)
    t_hbm  = bytes / hbm_bandwidth       (memory bound)
    bound  = max(t_mxu, t_hbm)           which one binds says what to fix

A sampler whose measured time sits near t_hbm with t_hbm >> t_mxu is
bandwidth-bound: more MFU is not available without cutting bytes (fusion,
bf16 pair tensors, smaller materialized intermediates) — that is the
honest "speed of light" for this architecture shape, and the number the
bench headline should be judged against.

Usage:  python tools/roofline_sampler.py [--n_mols 100] [--steps 250]
Writes one JSON line to stdout; run on an OTHERWISE IDLE chip.
"""

import argparse
import json
import time

# v5e (v5 lite): 197 TFLOP/s bf16, 819 GB/s HBM (public spec)
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 98.5e12
HBM_BYTES_PER_S = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_mols", type=int, default=100)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--config", default="configs/flowmol3.yml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import (MAX_GRAPHS_PER_ROW, model_from_config,
                                 pack_sizes, packed_dispatch_plan,
                                 read_config_file)
    from flowmol_tpu.data.stats import NAtomsDistribution

    config = read_config_file(args.config)
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))
    dt = str(model.cfg.vf.compute_dtype or "float32")
    peak = PEAK_FLOPS_BF16 if dt == "bfloat16" else PEAK_FLOPS_F32

    hist = NAtomsDistribution.load(
        "assets/data/geom_full_kekulized/train_data_n_atoms_histogram.npz")
    rng = np.random.default_rng(0)
    sizes = hist.sample(rng, args.n_mols)
    tiers, oversized = pack_sizes(sizes)

    dispatches = []
    total = {"flops": 0.0, "bytes": 0.0, "wall_s": 0.0}
    for cap, rows in tiers:
        for gids, cap_i, _ in packed_dispatch_plan(rows, cap, 128, 1):
            fn = jax.jit(model.make_sample_fn(
                n_timesteps=args.steps, n_graphs_per_row=MAX_GRAPHS_PER_ROW))
            g_dev = jnp.asarray(gids)
            compiled = fn.lower(params, jax.random.PRNGKey(0), g_dev).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            nbytes = float(ca.get("bytes accessed", 0.0))
            # warmup then measure (np.asarray forces the tunnel sync)
            jax.tree.map(np.asarray, compiled(params, jax.random.PRNGKey(1),
                                              g_dev))
            t0 = time.time()
            out = compiled(params, jax.random.PRNGKey(2), g_dev)
            jax.tree.map(np.asarray, out)
            wall = time.time() - t0
            t_mxu = flops / peak
            t_hbm = nbytes / HBM_BYTES_PER_S
            dispatches.append({
                "shape": list(gids.shape),
                "n_mols": sum(len(r) for r in rows),
                "gflops": round(flops / 1e9, 2),
                "gbytes": round(nbytes / 1e9, 3),
                "t_mxu_s": round(t_mxu, 4),
                "t_hbm_s": round(t_hbm, 4),
                "bound": "hbm" if t_hbm > t_mxu else "mxu",
                "t_bound_s": round(max(t_mxu, t_hbm), 4),
                "wall_s": round(wall, 3),
                "wall_over_bound": round(wall / max(t_mxu, t_hbm, 1e-9), 2),
                "arith_intensity_flops_per_byte": round(
                    flops / max(nbytes, 1.0), 2),
            })
            total["flops"] += flops
            total["bytes"] += nbytes
            total["wall_s"] += wall

    t_mxu = total["flops"] / peak
    t_hbm = total["bytes"] / HBM_BYTES_PER_S
    print(json.dumps({
        "protocol": {"n_mols": args.n_mols, "steps": args.steps,
                     "oversized": len(oversized), "dtype": dt},
        "total_gflops": round(total["flops"] / 1e9, 2),
        "total_gbytes": round(total["bytes"] / 1e9, 3),
        "t_mxu_s": round(t_mxu, 4),
        "t_hbm_s": round(t_hbm, 4),
        "bound": "hbm" if t_hbm > t_mxu else "mxu",
        "roofline_mols_per_sec": round(
            args.n_mols / max(t_mxu, t_hbm, 1e-9), 2),
        "measured_mols_per_sec": round(args.n_mols / total["wall_s"], 2),
        "wall_over_bound": round(total["wall_s"] / max(t_mxu, t_hbm, 1e-9), 2),
        "dispatches": dispatches,
    }))


if __name__ == "__main__":
    main()
