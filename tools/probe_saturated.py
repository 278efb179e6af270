#!/usr/bin/env python
"""Saturated-batch GEOM sampling throughput: one packed shape, full rows.

The reference's paper protocol samples n=5000 (fm3_evals/readme.md:22-25) —
at that scale the sampler runs wide, not fragmented, so per-chip throughput
at a SATURATED dispatch is the serving-relevant number (the n=100 headline
keeps reference-protocol comparability).  This probe times the 250-step
packed sampler at (B, cap) shapes filled with one size-cap molecule per row.

Usage: python tools/agent_run.py tools/probe_saturated.py [--steps 250]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/flowmol3.yml")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--shapes", type=str, default="64x56,128x56,256x56,128x96")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--s_msg", type=int, default=None,
                    help="compressed messaging: s_message_dim override")
    ap.add_argument("--v_msg", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import (MAX_GRAPHS_PER_ROW, model_from_config,
                                 read_config_file)

    config = read_config_file(args.config)
    if args.s_msg:
        config["vector_field"]["s_message_dim"] = args.s_msg
    if args.v_msg:
        config["vector_field"]["v_message_dim"] = args.v_msg
    model = model_from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))

    for shape in args.shapes.split(","):
        B, cap = (int(t) for t in shape.split("x"))
        gids = np.zeros((B, cap), np.int32)  # one size-cap molecule per row
        fn = jax.jit(model.make_sample_fn(
            n_timesteps=args.steps, n_graphs_per_row=MAX_GRAPHS_PER_ROW))
        g = jnp.asarray(gids)
        t0 = time.time()
        jax.tree.map(np.asarray, fn(params, jax.random.PRNGKey(1), g))
        t_compile = time.time() - t0
        t0 = time.time()
        outs = [fn(params, jax.random.PRNGKey(2 + r), g)
                for r in range(args.reps)]
        jax.tree.map(np.asarray, outs[-1])
        dt = (time.time() - t0) / args.reps
        print(f"({B:4d},{cap:3d}) {args.steps}-step sample: {dt:7.2f}s "
              f"= {B / dt:8.2f} mols/s/chip  "
              f"({dt / args.steps * 1e3:6.1f} ms/step, compile+first "
              f"{t_compile:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
