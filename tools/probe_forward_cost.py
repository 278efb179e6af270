#!/usr/bin/env python
"""Time a single denoiser forward (no scan) at various (batch, N) to localize
where sampler device time goes.  Optionally ablates arch pieces.

Usage: python tools/probe_forward_cost.py --points 96:8,96:32 [--ablate]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=str, default="96:8,96:32")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--ablate", action="store_true",
                    help="also time arch variants (updates=1, no dst feats, "
                         "no attention/compression)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flowmol_tpu.api import model_from_config, read_config_file

    def run(tag, config, n, b):
        from flowmol_tpu.model import FlowMol, FlowMolConfig
        model = FlowMol(FlowMolConfig.from_config(config))
        params = model.init_params(jax.random.PRNGKey(0))
        cfg = model.cfg
        km = cfg.vf.n_mask_feats
        x = jnp.zeros((b, n, 3))
        a = jnp.zeros((b, n, cfg.n_atom_types + km))
        c = jnp.zeros((b, n, cfg.n_atom_charges + km))
        e = jnp.zeros((b, n, n, cfg.n_bond_types + km))
        t = jnp.zeros((b,))
        nm = jnp.ones((b, n), bool)

        fwd = jax.jit(lambda p, *a_: model.net.apply(
            p, *a_, apply_softmax=True, remove_com=True, deterministic=True))
        out = fwd(params, x, a, c, e, t, nm)
        jax.tree.map(np.asarray, out)
        t0 = time.time()
        outs = [fwd(params, x, a, c, e, t, nm) for _ in range(args.reps)]
        jax.tree.map(np.asarray, outs[-1])
        dt = (time.time() - t0) / args.reps
        print(json.dumps({"tag": tag, "N": n, "B": b,
                          "ms_fwd": round(1e3 * dt, 3),
                          "ms_per_mol": round(1e3 * dt / b, 3)}), flush=True)

    base = read_config_file("configs/flowmol3.yml")
    points = [tuple(map(int, p.split(":"))) for p in args.points.split(",")]
    for n, b in points:
        run("full", base, n, b)
        if args.ablate:
            import copy
            v = copy.deepcopy(base)
            v["vector_field"]["n_molecule_updates"] = 1
            run("updates=1", v, n, b)
            v = copy.deepcopy(base)
            v["vector_field"]["use_dst_feats"] = False
            run("no_dst", v, n, b)
            v = copy.deepcopy(base)
            v["vector_field"]["n_cp_feats"] = 0
            run("no_cp", v, n, b)
            v = copy.deepcopy(base)
            v["vector_field"]["self_conditioning"] = False
            run("no_sc", v, n, b)


if __name__ == "__main__":
    main()
