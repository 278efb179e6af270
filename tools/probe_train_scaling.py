#!/usr/bin/env python
"""Train-step MFU vs batch size (VERDICT r4 item 5).

Round 3 measured 3.4% train MFU with device-only ~= pipeline step time
(device-bound).  The qm9 flagship config's 20k edge budget gives batch ~20
at bucket 32 — a 4-GPU-A100-era number.  This probe times the full jitted
train step (fwd + bwd + Adam + EMA) at one bucket across batch sizes to
find the v5e's saturation point.

Usage: python tools/agent_run.py tools/probe_train_scaling.py
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/qm9_ctmc_big.yml")
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--batches", type=str, default="20,64,128,256,512")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowmol_tpu.api import (data_module_from_config, model_from_config,
                                 read_config_file)
    from flowmol_tpu.train_utils.optim import LRScheduleConfig
    from flowmol_tpu.train_utils.step import create_train_state, make_train_step

    config = read_config_file(args.config)
    import os
    for cand in (config["dataset"]["processed_data_dir"],
                 "data/synthetic_qm9_20k", "data/synthetic_qm9"):
        if os.path.isdir(cand):
            config["dataset"]["processed_data_dir"] = cand
            break
    config["dataset"]["dataset_size"] = None

    model = model_from_config(config)
    lr_cfg = LRScheduleConfig()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr_cfg, 0.999)
    step = jax.jit(make_train_step(model, tx, lr_cfg, 0.999))

    dm = data_module_from_config(config)
    rng = np.random.default_rng(0)
    base = None
    for tb in dm.iter_split("train", rng):
        if tb.node_mask.shape[1] == args.bucket:
            base = tb
            break
    assert base is not None, f"no bucket-{args.bucket} batch emitted"
    b0 = base.node_mask.shape[0]

    PEAK_F32 = 98.5e12
    for B in (int(x) for x in args.batches.split(",")):
        reps = (B + b0 - 1) // b0
        tb = jax.tree.map(
            lambda a: jnp.asarray(np.concatenate([a] * reps, 0)[:B]), base)
        st, m = step(state, tb, jax.random.PRNGKey(1), jnp.asarray(0.0))
        float(np.asarray(m["total_train_loss"]))  # compile + warm
        flops = None
        try:
            ca = step.lower(state, tb, jax.random.PRNGKey(1),
                            jnp.asarray(0.0)).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        t0 = time.time()
        st = state
        for i in range(args.steps):
            st, m = step(st, tb, jax.random.PRNGKey(2 + i), jnp.asarray(0.0))
        float(np.asarray(m["total_train_loss"]))
        dt = (time.time() - t0) / args.steps
        mfu = f"{100 * flops / dt / PEAK_F32:5.2f}%" if flops else "  n/a"
        print(f"bucket {args.bucket} batch {B:4d}: {dt * 1e3:7.1f} ms/step  "
              f"{B / dt:8.1f} samples/s  mfu {mfu}", flush=True)


if __name__ == "__main__":
    main()
