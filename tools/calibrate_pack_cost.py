#!/usr/bin/env python
"""Measure the packed sampler's wall cost per padded pair per step, per row
capacity — the planner's cost model (api.PACK_COST_NS_PER_PAIR_STEP).

Round-3's planner assumed cost ∝ rows·cap² with a constant per-pair rate and
picked exactly the wrong plan (VERDICT r3 weak #2).  Round-4 profiling shows
the per-pair rate FALLS with capacity (XLA lane-pads the N-in-lanes pair
tensors: N=64 wastes half the lanes, N=128 none), so the honest model is
wall = rows · cap² · c(cap) · steps + overhead · n_dispatches, with c(cap)
measured here on the real chip.

Usage: python tools/calibrate_pack_cost.py [--steps 10] [--config ...]
Prints one JSON line {cap: ns_per_pair_per_step} — paste into
flowmol_tpu/api.py PACK_COST_NS_PER_PAIR_STEP when the hardware changes.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--config", default="configs/flowmol3.yml")
    ap.add_argument("--caps", type=int, nargs="*",
                    default=[48, 64, 96, 128, 192])
    ap.add_argument("--target_pairs", type=int, default=180224,
                    help="total padded pairs per dispatch (fixes work size)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import (MAX_GRAPHS_PER_ROW, model_from_config,
                                 read_config_file)

    config = read_config_file(args.config)
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    out = {}
    for cap in args.caps:
        B = max(2, args.target_pairs // (cap * cap))
        gids = np.full((B, cap), -1, np.int32)
        for r in range(B):
            # fill ~85% of the row with 1-3 molecules (realistic packing)
            off, g = 0, 0
            budget = int(cap * 0.85)
            while off < budget and g < MAX_GRAPHS_PER_ROW:
                s = int(min(rng.integers(cap // 3, cap), budget - off))
                if s < 4:
                    break
                gids[r, off:off + s] = g
                off += s
                g += 1
        g_dev = jnp.asarray(gids)
        fn = jax.jit(model.make_sample_fn(
            n_timesteps=args.steps, n_graphs_per_row=MAX_GRAPHS_PER_ROW))
        jax.tree.map(np.asarray, fn(params, jax.random.PRNGKey(1), g_dev))
        ts = []
        for i in range(2):
            t0 = time.time()
            jax.tree.map(np.asarray, fn(params, jax.random.PRNGKey(2 + i),
                                        g_dev))
            ts.append(time.time() - t0)
        wall = min(ts)
        ns = wall / args.steps / (B * cap * cap) * 1e9
        out[cap] = round(ns, 2)
        print(f"# cap={cap:4d} B={B:3d} wall={wall:.3f}s "
              f"-> {ns:.1f} ns/pair/step", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
